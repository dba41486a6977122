package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one hot key = one straggler task at 100 TB).
  *
  * AQE's skew-join handling (enabled in GraftSession) covers sort-merge
  * joins after the fact; explicit salting is the planned-ahead variant
  * that also works for pre-AQE shapes and for aggregations.
  */
object SkewOps {

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread over `salts` buckets and the small side replicated ×salts.
    * Result is row-identical to the plain join; the shuffle partitions
    * the hot key into `salts` independent tasks.
    *
    * The big side's salt derives from xxhash64 of the whole row's key +
    * a per-row uniform draw (rand is seeded → deterministic plan).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(floor(rand(42) * salts), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * groupBy(key, salt) first, then re-aggregate by key. Spark's
    * hash aggregate already does map-side partials; this adds an extra
    * reduce level for keys too hot for one reducer.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int, out: String): DataFrame =
    df.withColumn("__salt", pmod(floor(rand(42) * salts), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(out))
}
