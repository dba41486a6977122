package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: pay the shuffle ONCE at write time so every
  * later equi-join or aggregation on the bucket key runs exchange-free.
  *
  * `bucketBy(n, key)` hash-partitions rows into n bucket files per
  * write task and records the bucket spec in the catalog; a scan of the
  * table then reports `HashPartitioning(key, n)` as its output
  * partitioning, and Catalyst drops the Exchange under any join or
  * aggregation keyed on `key` against a co-bucketed relation (same key,
  * same n). At 100 TB this converts the recurring fact⋈fact shuffle —
  * the single most expensive exchange in a star-schema pipeline — into
  * a one-time layout cost; the daily-append pattern keeps it amortized
  * because every appended batch buckets identically.
  *
  * `sortBy` additionally orders rows inside each bucket file, which
  * upgrades the join to sort-merge WITHOUT a sort stage when buckets
  * are single-file (one write task per bucket, or a compaction pass).
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortColumns: Seq[String] = Nil): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val sorts = if (sortColumns.isEmpty) Seq(key) else sortColumns
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }
}
