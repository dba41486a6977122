package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the standing maintenance job of any
  * long-lived lake. Streaming micro-batches and daily incremental
  * appends (the reference's write pattern) accumulate files far below
  * the scan-efficient size; at scale the file count, not the byte
  * count, becomes the bottleneck (driver listing time, task-per-file
  * scheduling, parquet footer overhead).
  *
  * Strategy: read the directory, repartition to ⌈bytes/target⌉, write
  * to a sibling temp dir, then swap via two FileSystem renames (the
  * closest a generic FS offers to atomicity; object stores with
  * non-atomic rename want a manifest/table format instead — out of
  * scope here, noted for honesty). Readers racing the swap see the old
  * or the new listing, never a mix. Partitioned layouts compose: run
  * per leaf partition directory.
  */
object Compaction {

  /** Compact one flat parquet directory. Returns (filesBefore,
    * filesAfter). Row content is preserved exactly; file boundaries
    * are not (repartition redistributes rows round-robin).
    */
  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(p: Path): Int =
      fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(path)
    val totalBytes = fs.getContentSummary(path).getLength
    val parts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (parts >= before) return (before, before) // already compact enough
    val tmp = new Path(path.getParent, path.getName + "__compact_tmp")
    val old = new Path(path.getParent, path.getName + "__compact_old")
    spark.read.parquet(dir).repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compaction swap failed: $path -> $old")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back; original data untouched
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $path")
    }
    fs.delete(old, true)
    (before, dataFiles(path))
  }
}
