package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows, the plain
  * shuffle join sends that key's entire volume to a single reducer. The
  * salted form splits each big-side key across `saltBuckets` reducers
  * (salt derived from a per-row id, NOT the key — salting by key would
  * keep the hot key together) and replicates the small side once per
  * bucket, so the result is identical to the plain join while the hot
  * key's work is spread `saltBuckets` ways. AQE's skew-join handles the
  * common cases automatically at runtime; this is the explicit form for
  * when the skew is known up front or AQE is unavailable (e.g. a
  * streaming join).
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, saltBuckets: Int): DataFrame =
    saltedEquiJoin(big, small, bigKey, smallKey, saltBuckets, lit(true))

  /** [[saltedEquiJoin]] with an extra (typically non-equi) predicate
    * evaluated inside the join — the theta-range shape: equi key carries
    * the skew (one hot user), the range bound prunes pairs. The salt
    * spreads the hot key's pair work over `saltBuckets` reducers while
    * the predicate still evaluates once per candidate pair. This is the
    * explicit fallback for when AQE skew-join is unavailable (streaming,
    * or a non-adaptive engine build); with AQE on, prefer the plain join
    * and `spark.sql.adaptive.skewJoin.enabled`.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, saltBuckets: Int,
      extraCond: Column): DataFrame = {
    require(saltBuckets > 0)
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(bigKey) === replicated(smallKey) && extraCond)
      .drop("__salt")
  }
}
