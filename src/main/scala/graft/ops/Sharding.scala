package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-shard export: fixed-size contiguous shards of a globally
  * ordered corpus (the layout sequential training readers consume —
  * shard files a data loader can open independently while preserving
  * the global sample order).
  *
  * Composes with the deterministic training order
  * ([[graft.queries.CurationQueries.qShuffleOrder]]): position →
  * shard is pure arithmetic, so the shard layout is as reproducible
  * as the order itself.
  */
object Sharding {

  /** 0-based shard id of a 1-based position. Double division is exact
    * for positions below 2^53 — far above any corpus row count.
    */
  def shardId(pos: Column, rowsPerShard: Long): Column =
    floor((pos - lit(1L)) / lit(rowsPerShard.toDouble)).cast(LongType)

  /** Writes `df` as parquet under `path`, partitioned by `shard=N`
    * directories, rows inside each shard ascending by `posCol`.
    *
    * One HASH shuffle on the shard id co-locates every row of a shard
    * in one task (a range shuffle on (shard, pos) would split a shard
    * across tasks and its directory into unordered fragments), then a
    * per-task sort + dynamic-partition write emits exactly one ordered
    * file per shard directory — no post-hoc compaction, no driver-side
    * loop. Shards are bounded (`rowsPerShard`), so hash skew is
    * bounded; with more shards than tasks each task just writes several
    * shard files sequentially.
    */
  def exportShards(df: DataFrame, posCol: String, rowsPerShard: Long,
                   path: String): Unit =
    df.withColumn("shard", shardId(col(posCol), rowsPerShard))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(posCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
