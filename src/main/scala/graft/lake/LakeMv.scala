package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained MATERIALIZED VIEW over a [[LakeTable]]:
  * a grouped (count, DECIMAL sum) aggregate kept as its own lake table
  * and refreshed from the base's copy-on-write CHANGE FEED instead of
  * recomputed.
  *
  * Why this scales: [[LakeTable.changesBetween]] reads only the files
  * the two manifests do NOT share — on a 100 TB base, a point merge or
  * an append yields a handful of changed files, so a refresh costs
  * O(delta) + O(|groups|), never O(table). Inserts fold as +1/+value,
  * deletes (including merge-on-read deletion-vector masks, which
  * surface in the feed via file signatures) as −1/−value; DECIMAL
  * arithmetic makes the incremental result EXACTLY equal to a full
  * recompute, not approximately.
  *
  * Consistency anchor: the base version a refresh folded to rides the
  * MV table's txn ledger IN THE SAME COMMIT as the refreshed rows
  * ([[LakeTable.overwriteWithTxn]]), so a crash between "apply delta"
  * and "record progress" is impossible by construction — the pair is
  * one atomic manifest. A replayed refresh sees the anchor already at
  * head and no-ops.
  */
class LakeMv private (spark: SparkSession, val table: LakeTable,
    base: LakeTable, groupCols: Seq[String], valueCol: String) {

  /** The base-table version the view currently reflects. */
  def baseVersion: Int = {
    val m = table.manifest(table.currentVersion)
    m.txns.getOrElse(LakeMv.TxnKey,
      throw new IllegalStateException(
        s"${table.path} carries no MV anchor — not a LakeMv table, or its " +
          "init anchor commit never landed; re-create the view")).toInt
  }

  def read(): DataFrame = table.read()

  /** Fold the base's change feed since [[baseVersion]] into the view.
    * Returns the number of change-feed rows scanned — the caller's
    * evidence the refresh was delta-bounded (0 = already current).
    */
  def refresh(): Long = {
    val from = baseVersion
    val to = base.currentVersion
    if (to == from) return 0L
    val changes = base.changesBetween(from, to).persist()
    try {
      val nScanned = changes.count()
      val sign = when(col("_change_type") === "insert", lit(1)).otherwise(lit(-1))
      val delta = changes.groupBy(groupCols.map(col): _*)
        .agg(sum(sign).as("_dcnt"),
          sum(col(valueCol).cast("decimal(18,2)") * sign)
            .cast("decimal(28,2)").as("_dtotal"))
      val merged = table.read().join(delta, groupCols, "full_outer")
        .select(groupCols.map(col) ++ Seq(
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("_dcnt"), lit(0L)))
            .cast("long").as("cnt"),
          (coalesce(col("total"), lit(0).cast("decimal(28,2)")) +
            coalesce(col("_dtotal"), lit(0).cast("decimal(28,2)")))
            .cast("decimal(28,2)").as("total")): _*)
        .filter(col("cnt") > 0)
      table.overwriteWithTxn(merged, LakeMv.TxnKey, to.toLong)
      nScanned
    } finally changes.unpersist(blocking = false)
  }
}

object LakeMv {

  /** Ledger key anchoring the folded base version in the MV manifest. */
  private[lake] val TxnKey = "graft.mv.base.version"

  private def aggregate(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("total"))

  /** Materialize `SELECT groupCols, count(*), sum(valueCol)` over the
    * base's CURRENT version at `mvPath` and anchor that version. The
    * anchor lands in a second (metadata-only) commit right after the
    * create; a crash between the two leaves an un-anchored table that
    * [[LakeMv.baseVersion]] rejects loudly — never a silent
    * double-fold.
    */
  def create(spark: SparkSession, mvPath: String, base: LakeTable,
      groupCols: Seq[String], valueCol: String): LakeMv = {
    val v = base.currentVersion
    val t = LakeTable.create(spark, mvPath,
      aggregate(base.readVersion(v), groupCols, valueCol))
    t.anchorTxn("mv-anchor", TxnKey, v.toLong)
    new LakeMv(spark, t, base, groupCols, valueCol)
  }

  /** Open an existing view (the aggregate spec is the caller's
    * contract, as with any MV definition).
    */
  def forPath(spark: SparkSession, mvPath: String, base: LakeTable,
      groupCols: Seq[String], valueCol: String): LakeMv =
    new LakeMv(spark, LakeTable.forPath(spark, mvPath), base,
      groupCols, valueCol)
}
