package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench: decompose dedup_ngram stage costs. runMain graft.QMicro */
object QMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(label: String)(thunk: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = thunk
      println(f"[qmicro] $label rows=$c t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, sfDir)
    for (rep <- 1 to 2) {
      time(s"rep$rep shingleSets") {
        graft.api.DedupOps.shingleSets(docs, "doc_id", "text", 2).count()
      }
      val sets = graft.api.DedupOps.shingleSets(docs, "doc_id", "text", 2)
      time(s"rep$rep full-pairs") {
        graft.api.DedupOps.nearJaccardPairsOnSets(sets, 3, 5).count()
      }
      // pre-materialized sets: isolates the pair-join cost
      val dir = s"${System.getProperty("java.io.tmpdir")}/qmicro_sets"
      sets.write.mode("overwrite").parquet(dir)
      val cached = spark.read.parquet(dir)
      time(s"rep$rep pairs-on-parquet-sets") {
        graft.api.DedupOps.nearJaccardPairsOnSets(cached, 3, 5).count()
      }
    }
    spark.stop()
  }
}
