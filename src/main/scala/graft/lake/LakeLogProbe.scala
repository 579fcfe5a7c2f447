package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured delta-log probe at a LARGE control plane (graft.ScaleBench's
  * `log_50k`): builds a table whose manifest carries `nFiles` synthetic
  * entries (cloned from a real committed entry — the commit/reconstruct
  * path neither opens nor stats data files, so control-plane cost is
  * measurable without writing 50k parquet files), lays `nDeltas`
  * one-file deltas on top across a checkpoint boundary, then times
  *
  *  - a COLD snapshot reconstruction at the head (fresh handle: nearest
  *    checkpoint parse + delta fold — the reader-startup cost every
  *    query pays once per table), and
  *  - one more single-file delta commit against the full-size snapshot
  *    (the steady-state writer cost; its BYTES are the O(changed-files)
  *    pin, asserted < 2 KB in LakeDeltaLogSpec).
  *
  * At 100 TB a table is ~50k files at 2 GB/file — this probe pins that
  * point's control-plane latency directly instead of extrapolating
  * from the harness-sized tables the declared lake keys build.
  */
object LakeLogProbe {

  /** Returns (reconstructMsAtHead, deltaCommitMs, deltaBytes, nFilesAtHead). */
  def run(spark: SparkSession, path: String, nFiles: Int,
      nDeltas: Int): (Double, Double, Long, Int) = {
    import spark.implicits._
    val seed = (1 to 8).map(i => (i.toLong, s"s$i", i * 10.0)).toDF("k", "cat", "price")
    val t = LakeTable.create(spark, path, seed.coalesce(1), Seq("k"))
    val proto = t.manifest(1).files.head
    def entries(names: Seq[String]) = names.zipWithIndex.map { case (n, i) =>
      proto.copy(name = n, stats = Map("k" -> ((i * 100L, i * 100L + 99L))))
    }
    val base = (1 to nFiles).map(i => f"synthetic-$i%06d.parquet")
    t.commitForTest(2, t.manifest(1).copy(operation = "bigLoad", files = entries(base)))
    var names = base
    (1 to nDeltas).foreach { d =>
      names = names :+ f"delta-$d%04d.parquet"
      t.commitForTest(2 + d, t.manifest(1 + d).copy(operation = s"append$d",
        files = entries(names)))
    }
    val head = 2 + nDeltas
    // cold reconstruction: a fresh handle must parse the nearest
    // checkpoint and fold the delta tail — time the full manifest walk
    val t0 = System.nanoTime()
    val fresh = LakeTable.forPath(spark, path)
    val nAtHead = fresh.manifest(head).files.size
    val reconstructMs = (System.nanoTime() - t0) / 1e6
    // steady-state writer: one more single-file delta on the full snapshot
    val t1 = System.nanoTime()
    t.commitForTest(head + 1, t.manifest(head).copy(operation = "probeAppend",
      files = entries(names :+ "probe-tail.parquet")))
    val commitMs = (System.nanoTime() - t1) / 1e6
    val deltaBytes = new java.io.File(s"$path/_graft_log",
      f"v${head + 1}%08d.delta").length()
    (reconstructMs, commitMs, deltaBytes, nAtHead)
  }
}
