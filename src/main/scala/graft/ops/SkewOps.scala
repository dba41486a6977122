package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one hot key = one straggler task at 100 TB).
  *
  * AQE's skew-join handling (enabled in GraftSession) covers sort-merge
  * joins after the fact; explicit salting is the planned-ahead variant
  * that also works for pre-AQE shapes and for aggregations.
  */
object SkewOps {

  /** Join types for which replicating the small side ×salts preserves
    * semantics. right/full outer joins are rejected: each UNMATCHED
    * small-side row would be emitted once per salt replica.
    */
  private val saltableJoinTypes =
    Set("inner", "cross", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  /** Deterministic per-row salt in [0, salts): xxhash64 of every column
    * plus the physical partition id. Pure function of row content +
    * partition, so a task retry recomputes identical salts (rand() would
    * not, corrupting the join under speculative execution); the
    * partition-id term spreads even bit-identical duplicate rows.
    */
  private def rowSalt(df: DataFrame, salts: Int) =
    pmod(xxhash64(df.columns.map(col) :+ spark_partition_id(): _*), lit(salts)).cast("int")

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread over `salts` buckets and the small side replicated ×salts.
    * Row-identical to the plain join for every join type in
    * [[saltableJoinTypes]] (others are rejected up front); the shuffle
    * splits each hot key into `salts` independent tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val canonical = joinType.toLowerCase.replace("_", "")
    require(saltableJoinTypes.contains(canonical),
      s"saltedJoin cannot preserve '$joinType' semantics: unmatched small-side " +
        "rows would be duplicated once per salt — use the plain join (AQE " +
        "skew handling) for right/full outer shapes")
    val saltedBig = big.withColumn("__salt", rowSalt(big, salts))
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
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(out))
}
