package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.6 Sorts / limits / top-k / set operations.
  *
  * topk compiles to TakeOrderedAndProject (per-partition heap + driver
  * merge of k rows — no global sort, no full shuffle), which is the shape
  * that survives 100 TB. Set ops are distinct-based (hash shuffle on the
  * full row); union_all is shuffle-free.
  */
object SortSetQueries {

  val queries: Map[String, Q] = Map(
    "sort_multi" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(asc("l_returnflag"), desc_nulls_last("l_extendedprice"),
          asc("l_orderkey"), asc("l_linenumber"))
    }),

    "topk" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
    }),

    "set_union_all" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val old = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), lit("old").as("era"))
      val recent = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), lit("new").as("era"))
      old.unionAll(recent).orderBy(col("o_orderkey"), col("era"))
    }),

    "set_union_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(col("l_partkey").as("partkey"))
        .union(Tables.part(s, dir).select(col("p_partkey").as("partkey")))
        .distinct()
        .orderBy(col("partkey"))
    }),

    "set_intersect" -> ((s, dir) => {
      Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
        .intersect(Tables.customer(s, dir)
          .filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey")))
        .orderBy(col("custkey"))
    }),

    "set_except" -> ((s, dir) => {
      Tables.part(s, dir).select(col("p_partkey").as("partkey"))
        .except(Tables.lineitem(s, dir).select(col("l_partkey").as("partkey")))
        .orderBy(col("partkey"))
    }),

    // bag semantics: multiplicities min() / subtract, not dedup
    "set_intersect_all" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(col("l_partkey").as("partkey"))
        .intersectAll(Tables.lineitem(s, dir)
          .filter(col("l_quantity") > 25).select(col("l_partkey").as("partkey")))
        .groupBy(col("partkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("partkey"))
    }),

    "set_except_all" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(col("l_partkey").as("partkey"))
        .exceptAll(Tables.lineitem(s, dir)
          .filter(col("l_quantity") > 25).select(col("l_partkey").as("partkey")))
        .groupBy(col("partkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("partkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY l_returnflag ASC, l_extendedprice DESC NULLS LAST,
        |  l_orderkey ASC, l_linenumber ASC""".stripMargin,

    "topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "set_union_all" ->
      """SELECT o_orderkey, 'old' AS era FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |UNION ALL
        |SELECT o_orderkey, 'new' AS era FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |ORDER BY o_orderkey, era""".stripMargin,

    "set_union_distinct" ->
      """SELECT DISTINCT partkey FROM (
        |  SELECT l_partkey AS partkey FROM lineitem
        |  UNION ALL SELECT p_partkey AS partkey FROM part)
        |ORDER BY partkey""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY custkey""".stripMargin,

    "set_except" ->
      """SELECT p_partkey AS partkey FROM part
        |EXCEPT
        |SELECT l_partkey AS partkey FROM lineitem
        |ORDER BY partkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT partkey, count(*) AS n FROM (
        |  SELECT l_partkey AS partkey FROM lineitem
        |  INTERSECT ALL
        |  SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity > 25)
        |GROUP BY partkey ORDER BY partkey""".stripMargin,

    "set_except_all" ->
      """SELECT partkey, count(*) AS n FROM (
        |  SELECT l_partkey AS partkey FROM lineitem
        |  EXCEPT ALL
        |  SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity > 25)
        |GROUP BY partkey ORDER BY partkey""".stripMargin
  )
}
