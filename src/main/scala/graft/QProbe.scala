package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad probe: SQL surface support checks. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      s.sql("SELECT id, sum(id) OVER (ORDER BY id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS sx FROM range(5)").show()
    } catch { case e: Throwable => println("EXCLUDE unsupported: " + e.getMessage.take(150)) }
    try {
      s.sql("SELECT map_zip_with(map('a',1,'b',2), map('a',10,'b',20), (k,v1,v2) -> v1+v2)['a'] AS mz, element_at(transform_values(map('a',1),(k,v)->v*2),'a') AS tv, map_keys(map_filter(map('a',1,'b',5), (k,v)->v>2))[0] AS mf").show()
    } catch { case e: Throwable => println("mapfns: " + e.getMessage.take(150)) }
    s.stop()
  }
}
