package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Surfaces lake-manifest statistics to the cost-based optimizer: a
  * session-catalog lake table (`CREATE TABLE ... USING graft.lake`)
  * plans through a [[LogicalRelation]] whose `CatalogTable` carries no
  * stats, so the CBO sees only `FileIndex.sizeInBytes` — good enough to
  * broadcast a small dim, blind to everything else. This rule copies
  * the manifest's exact knowledge into `CatalogStatistics` right before
  * planning:
  *
  *  - `rowCount` = Σ(file rows − deletion-vector-masked rows) — exact,
  *    no scan;
  *  - per-column min/max for every integral stats column (the same
  *    per-file bounds that drive manifest file pruning, folded to table
  *    level), plus truncated string bounds (min is exact-or-lower, max
  *    is exact-or-higher — safe for estimation);
  *  - an ndv UPPER BOUND for integral columns, min(rowCount,
  *    max−min+1) — enough for equality-selectivity estimates to be sane
  *    without an HLL pass.
  *
  * With `spark.sql.cbo.enabled`, FilterEstimation then interpolates
  * range predicates against these bounds: a fact table filtered to a
  * narrow key range gets a realistically small size estimate and
  * BROADCASTS UNHINTED where the size-only estimate would have planned
  * a sort-merge join. At 100 TB this is the difference between
  * shuffling a petabyte fact once per dim join and shipping the pruned
  * slice — and the estimate costs zero I/O because the manifest already
  * holds the numbers. ANALYZE-provided stats win if present (the rule
  * only fills the gap).
  */
case class LakeCboStatsRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case lr: LogicalRelation if lr.catalogTable.exists(_.stats.isEmpty) &&
        lr.relation.isInstanceOf[HadoopFsRelation] &&
        lr.relation.asInstanceOf[HadoopFsRelation].location.isInstanceOf[LakeFileIndex] =>
      val idx = lr.relation.asInstanceOf[HadoopFsRelation].location
        .asInstanceOf[LakeFileIndex]
      val ct = lr.catalogTable.get
      lr.copy(catalogTable =
        Some(ct.copy(stats = Some(LakeCboStatsRule.statsOf(idx)))))
  }
}

object LakeCboStatsRule {

  /** Spec hook: the statistics the rule would attach for `t`'s current
    * snapshot (tests live outside this package and cannot build the
    * private file index themselves).
    */
  def statsOfForTest(spark: SparkSession, t: LakeTable): CatalogStatistics =
    statsOf(new LakeFileIndex(spark, t.path, t.manifest(t.currentVersion)))

  /** Fold the manifest's per-file stats to table-level
    * CatalogStatistics. Pure manifest arithmetic — no file I/O.
    */
  private[lake] def statsOf(idx: LakeFileIndex): CatalogStatistics = {
    val m = idx.manifestSnapshot
    val rowCount = m.files.map(f => f.rows - f.dvRows).sum
    val schema = m.schema
    val colStats: Map[String, CatalogColumnStat] = m.statsCols.flatMap { c =>
      val phys = m.physOf(c)
      val dt = schema.find(_.name == c).map(_.dataType)
      val longBounds: Option[(Long, Long)] =
        if (m.files.nonEmpty && m.files.forall(_.stats.contains(phys)))
          Some((m.files.map(_.stats(phys)._1).min, m.files.map(_.stats(phys)._2).max))
        else None
      val strBounds: Option[(String, Option[String])] =
        if (m.files.nonEmpty && m.files.forall(_.strStats.contains(phys)))
          Some((m.files.map(_.strStats(phys)._1).min(Ordering.fromLessThan[String](
              (a, b) => LakeTable.utf8Cmp(a, b) < 0)),
            m.files.map(_.strStats(phys)._2)
              .foldLeft(Option("")) {
                case (Some(acc), Some(v)) =>
                  Some(if (LakeTable.utf8Cmp(acc, v) >= 0) acc else v)
                case _ => None
              }))
        else None
      (dt, longBounds, strBounds) match {
        case (Some(t), Some((lo, hi)), _) if LakeTable.isIntegral(t) =>
          val ndv = math.min(rowCount, hi - lo + 1).max(1L)
          Some(c -> CatalogColumnStat(
            distinctCount = Some(BigInt(ndv)),
            min = Some(lo.toString), max = Some(hi.toString),
            nullCount = Some(BigInt(0)),
            avgLen = Some(8L), maxLen = Some(8L)))
        case (Some(org.apache.spark.sql.types.StringType), _, Some((lo, hiOpt))) =>
          // truncated bounds: min exact-or-lower, max exact-or-higher —
          // valid over-approximations for estimation. String min/max are
          // only used by equality/IN estimates when ndv is present, so
          // ship ndv = rowCount (upper bound) to keep estimates finite.
          Some(c -> CatalogColumnStat(
            distinctCount = Some(BigInt(rowCount.max(1L))),
            min = None, max = None,
            nullCount = Some(BigInt(0)),
            avgLen = Some(16L), maxLen = hiOpt.map(_.length.toLong)))
        case _ => None
      }
    }.toMap
    CatalogStatistics(
      sizeInBytes = BigInt(idx.sizeInBytes),
      rowCount = Some(BigInt(rowCount)),
      colStats = colStats)
  }
}
