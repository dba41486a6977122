package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the engine.
  *
  * One place for the scale-relevant knobs so tests, Verify and Bench
  * agree. Designed for a real cluster (AQE on, skew-join handling,
  * partition coalescing); `local[n]` is just the harness topology.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // engine extensions: custom SQL functions + optimizer rules
      // (LevenshteinBandRule et al). A cluster not built through this
      // factory gets the same via spark.sql.extensions=graft.GraftExtensions.
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // recognize DSv2 scans reporting KeyGroupedPartitioning (the
      // PartitionedSink catalog tables): GROUP BY / joins on the
      // partition column then plan zero exchanges
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // ... including when the partition keys are a strict SUBSET of
      // the join keys (fact ⋈ fact on (p, k), both layouts clustered
      // on p alone): rows with equal join keys necessarily share a
      // partition key, so co-located groups stay correct and the keyed
      // shuffle of both fact sides — the job's whole cost at 100 TB —
      // disappears. Spark's default (true) only eliminates the shuffle
      // when partition keys cover EVERY join key.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // ... and when only ONE side is a key-grouped table, shuffle just
      // the OTHER side into the table's existing layout instead of
      // re-shuffling both: at 100 TB the stored fact never moves — the
      // incoming (smaller) relation pays the one exchange.
      .config("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      // partitioned INSERT OVERWRITE replaces only the partitions in the
      // batch — never a full-table truncate (CatalogWarehouse relies on it)
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // harness events.parquet has shipped as TIMESTAMP(NANOS) (which the
      // Spark reader rejects by default; read as long, convert in
      // Tables.events) AND as tz-less micros (which would infer as
      // TIMESTAMP_NTZ and break every unix_micros/window call downstream
      // — read it as LTZ, exact under the pinned UTC session timezone)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // local file:// scheme: without libhadoop, Hadoop's setPermission
      // FORKS a chmod process per created file/dir (~4-8 ms each; every
      // sink commit creates dozens of small files — staged data, .crc
      // sidecars, stats/bloom/version manifests). FastLocalFileSystem
      // keeps the exact LocalFileSystem semantics with a java.nio
      // setPermission (see its scaladoc for the measurements). On a
      // real cluster this only affects local staging/scratch I/O;
      // object-store schemes are untouched.
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.sources.FastLocalFileSystem].getName)
      .config("spark.ui.enabled", "false")

  /** Harness-local session: local[cpus] (env SPARK_GRAFT_CPUS,
    * default 4 — measured, not assumed: at the harness's bench scale
    * (sf0.1) 4 threads beat 32 on this 32-core box in matched back-to-
    * back runs (14.2 s vs 17.6 s total), because sub-second queries
    * over ~60k-row tables are dominated by per-task scheduling and
    * single-JVM contention, not scan/shuffle work — though ambient-load
    * variance on the shared box is large, so small deltas are noise.
    * Parallelism should track the DATA, and shuffle partitions track
    * the threads: at real scale set SPARK_GRAFT_CPUS to the core count
    * and size spark.sql.files.maxPartitionBytes so splits stay ~128 MB.
    */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Harness-local session SIZED TO THE DATA it will process: shuffle
    * parallelism must track input bytes, not the thread count — at
    * sf10 the 4-partition default put ~300 MB of shuffle per partition
    * and SPILLED, which read as superlinear scaling until a manual
    * thread override disproved it (r13 adjudication, SURVEY §8). The
    * AQE initial partition number scales as totalInputBytes / 64 MB
    * (the advisory partition size), clamped to [threads, 256];
    * coalescePartitions then merges small post-shuffle outputs back
    * down, so small-sf runs keep their low task overheads while big-sf
    * runs stop spilling — the same conf a 1000-executor cluster wants.
    */
  def localForData(dataDir: String, multiplier: Double = 1.0): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val bytes =
      try {
        val root = new java.io.File(dataDir)
        def size(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(size).sum
          else f.length()
        (size(root) * multiplier).toLong
      } catch { case _: Throwable => 0L }
    val targetBytes = 64L * 1024 * 1024
    val parts = math.min(256L, math.max(cpus.toLong,
      (bytes + targetBytes - 1) / targetBytes)).toInt
    val s = builder(s"local[$cpus]", parts)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        parts.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    System.err.println(s"[session] $dataDir: ${bytes / 1000000} MB input" +
      s" -> $parts shuffle partitions ($cpus threads)")
    s
  }
}
