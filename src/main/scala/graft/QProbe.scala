package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad probe: percentile_disc / json array fn support. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (q <- Seq(
      "SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY id) AS pd FROM range(10)",
      "SELECT json_array_length(to_json(array(1,2,3))) AS jl, get_json_object(to_json(named_struct('a', 5, 'b', 'x')), '$.b') AS jb",
      "SELECT id, count(*) OVER () FROM range(3) TABLESAMPLE (50 PERCENT) REPEATABLE (42)"
    )) {
      try s.sql(q).show()
      catch { case e: Throwable => println("UNSUPPORTED: " + q.take(60) + " :: " + e.getMessage.take(120)) }
    }
    s.stop()
  }
}
