package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad probe: median as framed window fn; levenshtein cost check. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      s.sql("SELECT id, median(id) OVER (ORDER BY id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS m FROM range(8)").show()
    } catch { case e: Throwable => println("median window unsupported: " + e.getMessage.take(200)) }
    try {
      s.sql("SELECT id, percentile(id, 0.5) OVER (ORDER BY id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS p FROM range(8)").show()
    } catch { case e: Throwable => println("percentile window unsupported: " + e.getMessage.take(200)) }
    val t0 = System.nanoTime()
    val docs = Tables.documents(s, "/root/testdata/sf0.01")
    import org.apache.spark.sql.functions._
    val a = docs.select(col("doc_id").as("id_a"), col("text").as("ta"), col("n_chars").as("ca"))
    val b = docs.select(col("doc_id").as("id_b"), col("text").as("tb"), col("n_chars").as("cb"))
    val n = a.join(b, col("id_a") < col("id_b") && abs(col("ca") - col("cb")) <= 3)
      .filter(levenshtein(col("ta"), col("tb")) <= 10).count()
    println(s"editdist pairs=$n t=${(System.nanoTime()-t0)/1e9}s")
    s.stop()
  }
}
