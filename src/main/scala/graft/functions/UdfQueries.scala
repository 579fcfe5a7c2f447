package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders

/** §2.10 UDF / UDAF / UDTF surface.
  *
  * udf_scalar documents the cost of a black-box Scala UDF (breaks
  * whole-stage codegen + predicate pushdown across it) — it exists to
  * prove the extension point; everything else in this engine uses
  * built-ins on purpose.
  * udaf_geomean is a typed Aggregator (sum of logs, partial-merge safe —
  * the merge is associative so map-side partial aggregation still works).
  * udtf_explode_series is the Spark-idiomatic generator: sequence() +
  * explode, fully codegen'd, no custom Generator class needed.
  */
object UdfQueries {

  private val normalize = udf { s: String =>
    if (s == null) null else s.toLowerCase.replaceAll(" +", " ").trim
  }

  /** Geometric mean via sum-of-logs; (sumLog, n) is the buffer. */
  private object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) = (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double = math.exp(b._1 / b._2)
    def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder = Encoders.scalaDouble
  }

  val queries: Map[String, Q] = Map(
    "udf_scalar" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          normalize(concat(col("p_name"), lit("   "), col("p_type"))).as("norm_name"))
        .orderBy(col("p_partkey"))
    }),

    "udaf_geomean" -> ((s, dir) => {
      val geomean = udaf(GeoMean)
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(round(geomean(col("o_totalprice")), 2).as("geo_price"))
        .orderBy(col("o_orderstatus"))
    }),

    "udtf_explode_series" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderkey") <= 200)
        .withColumn("n_days", (col("o_orderkey") % 5).cast("int"))
        .select(col("o_orderkey"), col("o_orderdate"),
          explode(sequence(lit(0), col("n_days"))).as("day_offset"))
        .select(col("o_orderkey"), col("day_offset"),
          date_add(col("o_orderdate").cast("date"), col("day_offset")).as("day_date"))
        .orderBy(col("o_orderkey"), col("day_offset"))
    })
  )

  val oracle: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT p_partkey,
        |  trim(regexp_replace(lower(p_name || '   ' || p_type), ' +', ' ', 'g')) AS norm_name
        |FROM part ORDER BY p_partkey""".stripMargin,

    "udaf_geomean" ->
      """SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 2) AS geo_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "udtf_explode_series" ->
      """SELECT o_orderkey,
        |  CAST(unnest(generate_series(0, o_orderkey % 5)) AS INT) AS day_offset,
        |  CAST(o_orderdate AS DATE)
        |    + CAST(unnest(generate_series(0, o_orderkey % 5)) AS INT) AS day_date
        |FROM orders WHERE o_orderkey <= 200
        |ORDER BY o_orderkey, day_offset""".stripMargin
  )
}
