package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench scratchpad: decompose the stage costs of whichever query
  * is currently under the knife. runMain graft.QMicro <query> [reps]
  *
  * Current shape: generic per-job profile of a declared query — one
  * line per Spark job with wall time and the job's callsite, so the
  * expensive phase of a multi-action query names itself.
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
    val name = args.headOption.getOrElse("sim_ann_graph")
    val reps = if (args.length > 1) args(1).toInt else 3
    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var profile = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        t0s.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(t0s.remove(je.jobId)).foreach { case (t0, cs) =>
          if (profile)
            println(f"[qmicro]   job=${je.jobId}%4d t=${(System.nanoTime() - t0) / 1e9}%7.3f s  $cs")
        }
      }
    })
    (1 to reps).foreach { i =>
      profile = i == reps // profile only the last (warm) rep
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      Thread.sleep(100)
      println(f"[qmicro] $name rep$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
