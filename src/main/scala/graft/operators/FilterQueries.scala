package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.2 Projection / filter / predicates.
  *
  * All predicates are plain Catalyst column expressions so they fold into
  * parquet pushdown / whole-stage codegen. project_cast uses floor()
  * before double→int casts because Spark truncates while DuckDB rounds —
  * floor makes both engines agree (and avoids ANSI overflow concerns).
  */
object FilterQueries {

  val queries: Map[String, Q] = Map(
    "filter_compare" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_quantity").between(10, 20) && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "filter_in_like" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_orderstatus").like("F%"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    "filter_null_bool" -> ((s, dir) => {
      // one from_json parse per row, not one Jackson parser + reader
      // per get_json_object call (the filter references both columns,
      // so the path-based form paid up to 4 parses per row)
      Tables.events(s, dir)
        .withColumn("p", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k STRING, nope STRING")))
        .withColumn("k", col("p.k"))
        .withColumn("missing", col("p.nope"))
        .filter(col("missing").isNull && col("k").isNotNull &&
          (!(col("event_type") === "error") || col("value") > 500))
        .select(col("event_id"), col("event_type"), col("k"))
        .orderBy(col("event_id"))
    }),

    "project_cast" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("int").as("qty_int"),
          col("l_shipdate").cast("date").cast("string").as("ship_str"),
          col("l_shipdate").cast("date").cast("string").cast("date").as("ship_date"),
          col("l_orderkey").cast("string").as("key_str"),
          when(col("l_extendedprice") < 10000, "low")
            .when(col("l_extendedprice") < 40000, "mid")
            .otherwise("high").as("price_bucket"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  val oracle: Map[String, String] = Map(
    "filter_compare" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "filter_in_like" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus LIKE 'F%'
        |ORDER BY o_orderkey""".stripMargin,

    "filter_null_bool" ->
      """SELECT event_id, event_type, props->>'$.k' AS k
        |FROM events
        |WHERE (props->>'$.nope') IS NULL AND (props->>'$.k') IS NOT NULL
        |  AND (NOT (event_type = 'error') OR value > 500)
        |ORDER BY event_id""".stripMargin,

    "project_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_quantity) AS INT) AS qty_int,
        |  strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_str,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  CAST(l_orderkey AS VARCHAR) AS key_str,
        |  CASE WHEN l_extendedprice < 10000 THEN 'low'
        |       WHEN l_extendedprice < 40000 THEN 'mid'
        |       ELSE 'high' END AS price_bucket
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
