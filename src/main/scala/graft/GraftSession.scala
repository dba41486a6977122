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
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // partitioned INSERT OVERWRITE replaces only the partitions in the
      // batch — never a full-table truncate (CatalogWarehouse relies on it)
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // harness events.parquet stores TIMESTAMP(NANOS) which the Spark
      // reader rejects by default; read as long, convert in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")

  /** Harness-local session: local[cpus] (env SPARK_GRAFT_CPUS, default 4). */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
