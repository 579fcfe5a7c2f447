package graft.etl

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Declared queries exercising the Pipeline facade end-to-end:
  * extract → clean → reshape/rollup → load → read-back, as one lazy plan
  * plus a single load action.
  */
object EtlQueries {

  val queries: Map[String, Q] = Map(
    // monthly revenue rollup per order status, through the full
    // extract→transform→load→read-back path
    "etl_pipeline" -> ((s, dir) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_rt/etl_pipeline"
      Pipeline(s)
        .extractParquet(s"$dir/orders.parquet")
        .transform(Stages.qcFilter("o_orderstatus", Seq("F", "O", "P")))
        .transform(Stages.timeRollup("o_orderdate", "month", Seq("o_orderstatus"),
          Seq(sum(Tables.dec2(col("o_totalprice"))).cast("double").as("monthly_total"),
            count(lit(1)).as("n_orders"))))
        .loadParquet(out)
        .orderBy(col("bucket"), col("o_orderstatus"))
    }),

    // element-pivot shape on events: event_type rows → per-type value
    // columns per user (the GHCN TMAX/TMIN/PRCP reshape, on our data)
    "etl_pivot_elements" -> ((s, dir) => {
      Pipeline(s, Some(Tables.events(s, dir)))
        .transform(Stages.pivotElements(Seq("user_id"), "event_type", "value",
          Seq("click", "purchase", "view")))
        .result
        .select(col("user_id"),
          round(col("click"), 6).as("click"),
          round(col("purchase"), 6).as("purchase"),
          round(col("view"), 6).as("view"))
        .orderBy(col("user_id"))
    }),

    // dynamic partition overwrite — the lakehouse backfill primitive:
    // re-running one day/priority replaces ONLY the partitions present
    // in the new batch, leaving every other partition untouched (static
    // overwrite mode would truncate the whole table). The patch batch
    // here doubles 1-URGENT totals; the declared output is the
    // post-overwrite read-back rollup, which proves both the replaced
    // and the preserved partitions. At 100 TB the write moves only the
    // patched partition's bytes and readers keep pruning on the same
    // directory layout.
    "etl_partition_overwrite" -> ((s, dir) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_rt/etl_part_ovw"
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      base.repartition(col("o_orderpriority"))
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
      val patch = base.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      patch.repartition(col("o_orderpriority"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority").parquet(out)
      s.read.parquet(out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("o_orderpriority"))
    }),

    // upsert/merge without a table format: updates win, everything else
    // survives — updates ∪ (base ⟕anti updates). At scale both sides
    // shuffle once on the key; with a real lakehouse format this becomes
    // MERGE INTO, but the plan shape (anti-join + union) is the same.
    // SCD Type-2 dimension merge: an update feed (here: odd custkeys get
    // a new segment) expires the current row (valid_to set, is_current
    // false) and appends the new version. The plan is two projections of
    // one scan + union — no join, no shuffle until the final sort; with a
    // real change feed the expire step becomes the same anti/semi join as
    // etl_upsert. History stays append-only, which is what makes SCD2 the
    // lakehouse-friendly dimension pattern at 100 TB.
    "etl_scd2" -> ((s, dir) => {
      val eff = "2024-06-01"
      val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
      val changed = col("c_custkey") % 2 === 1
      val expired = cust.select(
        col("c_custkey"), col("c_mktsegment").as("segment"),
        lit("1990-01-01").cast("date").as("valid_from"),
        when(changed, lit(eff).cast("date")).otherwise(lit(null).cast("date")).as("valid_to"),
        (!changed).as("is_current"))
      val fresh = cust.filter(changed).select(
        col("c_custkey"), lit("UPDATED").as("segment"),
        lit(eff).cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))
      expired.unionByName(fresh)
        .orderBy(col("c_custkey"), col("valid_from"))
    }),

    // data-quality audit — the gate every ingest pipeline runs before
    // promoting a batch. All per-column checks (nulls, domain ranges,
    // duplicate keys) fold into ONE scan of each table via conditional
    // aggregation; the referential orphan check is the only join (anti,
    // keyed, broadcast-able when the parent key set is small). Output is
    // the canonical (check, n_bad) shape a quality dashboard ingests.
    // observe()/Observation — pipeline metrics WITHOUT a second scan:
    // the metric aggregates ride along the normal action as accumulators
    // (zero extra jobs, zero extra shuffles — at 100 TB a separate
    // metrics query would re-read the table). Observation.get blocks on
    // the listener; building the 1-row result from it is metric-sized
    // driver control-plane, not data flow. The declared result proves
    // observed metrics == the SQL aggregates of the same scan.
    "etl_observe" -> ((s, dir) => {
      val obs = new org.apache.spark.sql.Observation()
      val df = Tables.orders(s, dir).observe(obs,
        count(lit(1)).as("n_rows"),
        round(sum(Tables.dec2(col("o_totalprice"))), 2).cast("double").as("sum_price"),
        count_if(col("o_totalprice") > 100000).as("n_big"))
      df.write.mode("overwrite").format("noop").save() // the real action
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
        m("sum_price").asInstanceOf[Double],
        m("n_big").asInstanceOf[Long]))
        .toDF("n_rows", "sum_price", "n_big")
    }),

    "etl_dq_checks" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val orderChecks = o.agg(
          count_if(col("o_custkey").isNull).as("null_custkey"),
          count_if(col("o_totalprice") <= 0).as("nonpos_price"),
          count_if(col("o_orderdate") > lit("2026-01-01").cast("timestamp")).as("future_orderdate"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_orderkey"))
        .select(expr(
          """stack(4,
            |  'null_custkey', null_custkey,
            |  'nonpos_price', nonpos_price,
            |  'future_orderdate', future_orderdate,
            |  'dup_orderkey', dup_orderkey) AS (check_name, n_bad)""".stripMargin))
      val orphans = Tables.lineitem(s, dir)
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_bad"))
        .select(lit("orphan_lineitem").as("check_name"), col("n_bad"))
      orderChecks.unionByName(orphans).orderBy(col("check_name"))
    }),

    // CDC snapshot diff: classify every key across two table snapshots
    // as added / removed / changed / unchanged — the change-data-capture
    // primitive when the source has no change feed. The "new" snapshot
    // is derived deterministically from orders (every 13th key deleted,
    // every 7th repriced). One full-outer join keyed on o_orderkey =
    // both snapshots shuffle once on the key, then a 4-group aggregate;
    // at 100 TB this is the standard nightly-snapshot reconciliation
    // plan (and with a lakehouse format the same diff drives MERGE).
    "etl_snapshot_diff" -> ((s, dir) => {
      val old = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k_old"), col("o_totalprice").as("p_old"))
      val nw = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey").as("k_new"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 50.0)
            .otherwise(col("o_totalprice")).as("p_new"))
      old.join(nw, col("k_old") === col("k_new"), "full_outer")
        .select(when(col("k_old").isNull, "added")
          .when(col("k_new").isNull, "removed")
          .when(col("p_old") =!= col("p_new"), "changed")
          .otherwise("unchanged").as("change_type"))
        .groupBy(col("change_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("change_type"))
    }),

    "etl_upsert" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 100.0).as("o_totalprice"))
      updates
        .unionByName(base.join(updates.select(col("o_orderkey")),
          Seq("o_orderkey"), "left_anti"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "etl_partition_overwrite" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN o_totalprice * 2 ELSE o_totalprice END
        |    AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "etl_snapshot_diff" ->
      """WITH nw AS (
        |  SELECT o_orderkey AS k_new,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 50.0
        |      ELSE o_totalprice END AS p_new
        |  FROM orders WHERE o_orderkey % 13 <> 0)
        |SELECT change_type, count(*) AS n FROM (
        |  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |    WHEN nw.k_new IS NULL THEN 'removed'
        |    WHEN o.o_totalprice <> nw.p_new THEN 'changed'
        |    ELSE 'unchanged' END AS change_type
        |  FROM orders o FULL OUTER JOIN nw ON o.o_orderkey = nw.k_new)
        |GROUP BY change_type ORDER BY change_type""".stripMargin,

    // observed accumulator metrics must equal the plain aggregates
    "etl_observe" ->
      """SELECT count(*) AS n_rows,
        |  round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) :: DOUBLE AS sum_price,
        |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big
        |FROM orders""".stripMargin,

    "etl_dq_checks" ->
      """SELECT * FROM (
        |  SELECT 'null_custkey' AS check_name, count(*) FILTER (WHERE o_custkey IS NULL) AS n_bad FROM orders
        |  UNION ALL
        |  SELECT 'nonpos_price', count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
        |  UNION ALL
        |  SELECT 'future_orderdate', count(*) FILTER (WHERE o_orderdate > TIMESTAMP '2026-01-01') FROM orders
        |  UNION ALL
        |  SELECT 'dup_orderkey', count(*) - count(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'orphan_lineitem', count(*) FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |ORDER BY check_name""".stripMargin,

    "etl_pipeline" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS bucket,
        |  o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_total,
        |  count(*) AS n_orders
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'O', 'P')
        |GROUP BY bucket, o_orderstatus
        |ORDER BY bucket, o_orderstatus""".stripMargin,

    "etl_upsert" ->
      """WITH updates AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 100.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT * FROM updates
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        |ORDER BY o_orderkey""".stripMargin,

    "etl_scd2" ->
      """SELECT c_custkey, c_mktsegment AS segment,
        |  DATE '1990-01-01' AS valid_from,
        |  CASE WHEN c_custkey % 2 = 1 THEN DATE '2024-06-01' END AS valid_to,
        |  c_custkey % 2 = 0 AS is_current
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, 'UPDATED', DATE '2024-06-01', NULL, true
        |FROM customer WHERE c_custkey % 2 = 1
        |ORDER BY c_custkey, valid_from""".stripMargin,

    "etl_pivot_elements" ->
      """SELECT user_id,
        |  round(min(value) FILTER (WHERE event_type = 'click'), 6) AS click,
        |  round(min(value) FILTER (WHERE event_type = 'purchase'), 6) AS purchase,
        |  round(min(value) FILTER (WHERE event_type = 'view'), 6) AS view
        |FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
