package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench scratchpad: decompose the stage costs of whichever query
  * is currently under the knife. runMain graft.QMicro
  */
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
      time(s"rep$rep pairs45") {
        graft.api.DedupOps.nearJaccardPairs(docs, "doc_id", "text").count()
      }
      time(s"rep$rep pairs910") {
        graft.api.DedupOps.nearJaccardPairs(docs, "doc_id", "text", 9, 10).count()
      }
      time(s"rep$rep cc-pairs45") {
        graft.api.DedupOps.connectedComponents(
          graft.api.DedupOps.nearJaccardPairs(docs, "doc_id", "text")
            .select(col("id_a"), col("id_b"))).count()
      }
      time(s"rep$rep pipeline-default") {
        graft.api.DedupOps.nearDupPipeline(docs, "doc_id", "text").count()
      }
      time(s"rep$rep logstar-pipeline") {
        graft.api.DedupOps.connectedComponentsLogStar(
          graft.api.DedupOps.nearDupPipeline(docs, "doc_id", "text")
            .select(col("id_a"), col("id_b"))).count()
      }
    }
    spark.stop()
  }
}
