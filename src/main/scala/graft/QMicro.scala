package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench scratchpad: decompose the stage costs of whichever query
  * is currently under the knife. runMain graft.QMicro
  *
  * Current target: per-microbatch cost breakdown of the stream-stream
  * outer joins (the two heaviest streaming keys) via StreamingQuery
  * progress durations.
  */
object QMicro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.streaming.StreamingDeclared.warmStaging(spark, dir)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[qmicro] started ${e.name} at ${System.currentTimeMillis}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[qmicro] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(s =>
            s"op(rows=${s.numRowsTotal},commit=${s.commitTimeMs}ms)").mkString(";")}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[qmicro] terminated at ${System.currentTimeMillis}")
    }
    spark.streams.addListener(listener)
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("stream_stream_outer")(spark, dir).count()
      println(f"[qmicro] rep$rep stream_stream_outer rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
