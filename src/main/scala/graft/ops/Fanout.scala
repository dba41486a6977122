package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive fan-out for COMPUTE-HEAVY map stages over
  * single-split inputs (guide §2.5 "input skew: one huge unsplittable
  * file … repartition immediately after the read").
  *
  * The harness corpora (and any small table) are one parquet row group,
  * so Spark plans the whole scan as ONE task — and every expression
  * fused into that scan stage runs single-threaded while the other
  * cores idle. For scan-light queries that is correct (the r18 round
  * MEASURED AND REJECTED a blanket fan-out in the loaders: the exchange
  * cost 3× more than the single-task compute it parallelized, because
  * it also destroyed the scan+filter+partial-agg fusion). For the
  * text/dedup operators the trade flips: tokenize + shingle + hash is
  * ~100 µs/row of pure CPU against ~2 KB/row of exchange bytes, so the
  * measured single-task stage is seconds long (q_source_similarity's
  * shingle explode: 4.0 s in one task at sf0.1 on 32 cores) and the
  * narrow exchange that spreads it is ~100× cheaper than the work it
  * parallelizes.
  *
  * [[spread]] therefore fires ONLY when the input is provably one scan
  * split: total input bytes within `spark.sql.files.maxPartitionBytes`
  * (at warehouse scale the scan already has thousands of splits and
  * this is a no-op) and above a floor that keeps trivial inputs fused
  * (an sf0.01 corpus's single task is already sub-100 ms; the exchange
  * would only add latency). The repartition hashes the caller's row
  * key — deterministic under task retry, unlike round-robin on
  * non-deterministic input (SPARK-38388) — so results are
  * partitioning-invariant by the same argument as every other keyed
  * exchange in the engine.
  */
object Fanout {
  /** Memo: absolute input path → total bytes (harness inputs are
    * immutable within a run; same discipline as Tables' schema memo).
    */
  private val sizeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def inputBytes(df: DataFrame): Long = {
    val files = try df.inputFiles catch { case _: Throwable => Array.empty[String] }
    if (files.isEmpty) -1L
    else files.map { f =>
      sizeMemo.computeIfAbsent(f, { p =>
        try {
          val path = new org.apache.hadoop.fs.Path(p)
          val fs = path.getFileSystem(
            df.sparkSession.sessionState.newHadoopConf())
          java.lang.Long.valueOf(fs.getFileStatus(path).getLen)
        } catch { case _: Throwable => java.lang.Long.valueOf(-1L) }
      }).longValue()
    }.sum
  }

  /** Floor below which the single fused task is already fast enough
    * that an exchange can only add latency (measured: the sf0.01
    * corpus's whole shingle pass is < 100 ms).
    */
  private final val MinBytes = 1L << 20

  /** Hash-repartition `df` across the session's cores by `key` when —
    * and only when — the input is a single scan split big enough to
    * matter. `df` should already be projected to the columns the heavy
    * map needs (the exchange carries nothing else).
    */
  /** Kill switch for same-JVM A/B measurement (graft.tools.*) and ops
    * escape hatch; the env var form survives into recorded runs.
    */
  @volatile var disabled: Boolean = sys.env.contains("SPARK_GRAFT_NO_FANOUT")

  def spread(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    if (disabled || cores <= 1) return df
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val bytes = inputBytes(df)
    if (bytes >= MinBytes && bytes <= maxSplit) df.repartition(cores, key)
    else df
  }
}
