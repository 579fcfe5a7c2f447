package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad probe: listagg / string_agg support. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (q <- Seq(
      "SELECT listagg(c, ',') WITHIN GROUP (ORDER BY c) FROM VALUES ('b'),('a'),('c') t(c)",
      "SELECT string_agg(c, ',') FROM VALUES ('b'),('a') t(c)",
      "SELECT id, any_value(id) IGNORE NULLS OVER (ORDER BY id) FROM range(3)"
    )) {
      try s.sql(q).show(false)
      catch { case e: Throwable => println("UNSUPPORTED: " + q.take(70) + " :: " + e.getMessage.take(100)) }
    }
    s.stop()
  }
}
