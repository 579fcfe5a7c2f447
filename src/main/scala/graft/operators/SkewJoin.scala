package graft.operators

import org.apache.spark.sql.DataFrame
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
      bigKey: String, smallKey: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0)
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(bigKey) === replicated(smallKey))
      .drop("__salt")
  }
}
