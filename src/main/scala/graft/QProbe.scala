package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratchpad probe: PQ ANN recall@5 across codebook geometries. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sf)
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("q_e"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("vec_id"))
    val brute = q.join(e, col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(graft.functions.DotProduct.dot(col("q_e"), col("e")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((m, ksub, iters) <- Seq((16, 16, 2), (16, 16, 3), (8, 32, 2))) {
      val ann = graft.api.SimilarityOps.pqTopK(emb, "vec_id", "embedding",
          queryPred = col("vec_id") < 10, k = 5, m = m, ksub = ksub, iters = iters)
        .select(col("q_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = brute.count(ann.contains)
      println(s"[qprobe] m=$m ksub=$ksub iters=$iters recall@5=${hit.toDouble / brute.size}")
    }
    spark.stop()
  }
}
