package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted join: replicate the small side `salt` times, scatter the
  * skewed big side uniformly across the replicas.
  *
  * AQE's skew-join split handles most runtime skew; salting is the static
  * fallback when one key dominates so heavily that a single task would
  * still spill (e.g. one symbol = 30% of all ticks). Cost: small side
  * ×salt — only worth it on genuinely pathological keys.
  */
object SaltedJoin {

  /** Inner-join `big` with `small` on `key`, spreading each big-side key
    * over `salt` sub-partitions.
    */
  def apply(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val replicas = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicas, Seq(key, "_salt")).drop("_salt")
  }
}
