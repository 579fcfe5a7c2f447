package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad probe: csv glob readback of the V2 sink output. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (p <- Seq("/tmp/graft_rt/v2_sink/part-*", "/tmp/graft_rt/v2_sink/part-0")) {
      try {
        val d = s.read.schema("key LONG, n LONG").csv(p)
        println(s"OK $p count=" + d.count())
      } catch { case e: Throwable => println(s"FAILED $p :: " + e.toString.take(200)) }
    }
    s.stop()
  }
}
