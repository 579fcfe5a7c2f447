package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratchpad probe: cluster-blocked semantic-dedup recall. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sf)
    val exact = graft.api.SimilarityOps
      .nearDupPairs(emb, "vec_id", "embedding", threshold = 0.45)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((nc, it, pr) <- Seq((8, 2, 1), (8, 2, 2), (8, 2, 3), (16, 2, 2), (4, 2, 2))) {
      val sem = graft.api.SimilarityOps
        .clusterBlockedPairs(emb, "vec_id", "embedding", 0.45, nc, it, pr)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = exact.count(sem.contains)
      println(s"[qprobe] nc=$nc iters=$it probes=$pr exact=${exact.size} recall=${if (exact.isEmpty) 1.0 else hit.toDouble / exact.size}")
    }
    spark.stop()
  }
}
