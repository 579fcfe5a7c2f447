package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Reshape operators — pivot / unpivot (the canonical weather-ETL
  * transform: element rows ⇄ element columns).
  *
  * Pivot with an explicit value list compiles to a single pass
  * (groupBy + conditional aggregates), no extra shuffle vs a plain
  * aggregation — the shape to insist on at 100 TB (pivot without the
  * value list triggers a distinct-scan first). Unpivot is a generator
  * (expand), shuffle-free.
  */
object ReshapeQueries {

  val queries: Map[String, Q] = Map(
    "reshape_pivot" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(Tables.dec2(col("l_quantity"))).cast("double"))
        .withColumnRenamed("A", "qty_a")
        .withColumnRenamed("N", "qty_n")
        .withColumnRenamed("R", "qty_r")
        .orderBy(col("l_linestatus"))
    }),

    // nested build → flatten roundtrip: collect each order's lines into a
    // sorted array<struct> (the one-document-per-entity export shape for
    // training data / JSON feeds), then explode it back flat with inline.
    // One keyed shuffle builds the nesting; inline is a generator —
    // shuffle-free. The roundtrip is oracled against the plain join it
    // must reproduce exactly.
    "reshape_nested" -> ((s, dir) => {
      val items = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber"), col("l_quantity")))).as("items"))
      Tables.orders(s, dir)
        .join(items, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderstatus"), inline(col("items")))
        .orderBy(col("o_orderkey"), col("l_linenumber"))
    }),

    "reshape_unpivot" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "attr", "val")
        .orderBy(col("p_partkey"), col("attr"))
    }),

    // Dataset.transpose (Spark 4.0): rows ↔ columns of a SMALL summary
    // frame — the index column's values become column names, remaining
    // column names become the `key` column. Bounded by construction
    // (transpose collects the frame shape to the driver, so it is a
    // reporting-tier op for aggregate outputs, never a data-tier one —
    // same class as reshape_pivot's pinned domain).
    "reshape_transpose" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).cast("double").as("n"),
          round(sum(Tables.dec2(col("o_totalprice"))), 2).cast("double").as("sum_price"))
        .transpose(col("o_orderstatus"))
        .orderBy(col("key"))
    })
  )

  val oracle: Map[String, String] = Map(
    "reshape_pivot" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "reshape_nested" ->
      """SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,

    "reshape_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part)
        |ORDER BY p_partkey, attr""".stripMargin,

    // transpose of the per-status summary: columns F/O/P, key rows n/sum_price
    "reshape_transpose" ->
      """WITH a AS (
        |  SELECT o_orderstatus AS s, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sp
        |  FROM orders GROUP BY 1)
        |SELECT 'n' AS key,
        |  max(n) FILTER (WHERE s = 'F') AS "F",
        |  max(n) FILTER (WHERE s = 'O') AS "O",
        |  max(n) FILTER (WHERE s = 'P') AS "P"
        |FROM a
        |UNION ALL
        |SELECT 'sum_price',
        |  max(sp) FILTER (WHERE s = 'F'),
        |  max(sp) FILTER (WHERE s = 'O'),
        |  max(sp) FILTER (WHERE s = 'P')
        |FROM a
        |ORDER BY key""".stripMargin
  )
}
