package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness testdata tables (TESTDATA.md).
  *
  * Every table is a plain parquet file under `sfDir`. Reads are
  * schema-on-read (parquet carries the schema); filters/projections
  * composed on top are pushed into the scan by Catalyst, so callers
  * should express narrowing declaratively rather than materializing.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema memo, keyed by absolute file path: `spark.read.parquet`
    * without an explicit schema runs a footer-inference JOB on every
    * call, and the loaders are called fresh per query per rep — at
    * bench scale that job (~30–50 ms) is pure overhead repeated
    * hundreds of times per sweep, and at warehouse scale it is a
    * driver-side footer read of a file whose schema cannot change
    * (harness testdata files are immutable within a run). The memo
    * holds METADATA only (a StructType per path), never rows — every
    * query still computes from the parquet bytes.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaMemo.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  /** o_orderdate/l_shipdate are the same physical-encoding-drift class
    * as events.ts (r8 incident): a regenerated harness file can ship
    * NANOS-as-long or tz-less timestamp[us]. Same normalization.
    */
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "lineitem"), "l_shipdate")

  /** Normalize one timestamp column to session-local TimestampType
    * across the three physical parquet encodings the harness has
    * shipped (see [[events]] for the per-encoding reasoning). */
  private def normalizeTs(raw: DataFrame, c: String): DataFrame =
    raw.schema(c).dataType match {
      case LongType =>
        // LongType here means the nanosAsLong legacy path (nanos since
        // epoch ≈ 1e18 for harness-era dates). A generator shipping
        // epoch-micros (~1e15) or epoch-millis (~1e12) as long would be
        // silently misread 1000× by the nanos division — fail loudly on
        // magnitude instead. One 1-row sample; runs once per loader call.
        val sample = raw.select(col(c)).na.drop().head(1)
        sample.headOption.map(_.getLong(0)).foreach { v =>
          require(v == 0L || math.abs(v) >= 1e17,
            s"$c is LongType but |$v| < 1e17: not nanos-since-epoch — " +
              "a new physical encoding needs an explicit branch here")
        }
        raw.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      case TimestampNTZType =>
        raw.withColumn(c, col(c).cast(TimestampType))
      case _ => raw
    }
  /** events.ts has shipped in THREE physical parquet encodings across
    * harness testdata generations, and this loader normalizes all of
    * them to session-local TimestampType (micros, UTC session tz):
    *
    *   - TIMESTAMP(NANOS): Spark's reader rejects it outright; with
    *     spark.sql.legacy.parquet.nanosAsLong (set in GraftSession) it
    *     arrives as a nanosecond long. Convert with integer division —
    *     `/` would go through double and lose precision at 1.7e18 ns.
    *     Harness data is µs-aligned, so the truncation is lossless.
    *   - tz-less timestamp[us] (isAdjustedToUTC=false): Spark reads it
    *     as TIMESTAMP_NTZ by default. Under the pinned UTC session
    *     timezone, casting NTZ→LTZ reinterprets the same wall-clock
    *     fields as the same UTC instant — exact, no offset math.
    *     GraftSession additionally disables inferTimestampNTZ so such
    *     files arrive as LTZ directly; the branch here covers sessions
    *     built outside GraftSession.
    *   - timestamp[us] adjusted to UTC: arrives as TimestampType, no-op.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  /** embeddings.embedding is Array[Float] by engine contract; a
    * regenerated harness file could plausibly ship float64 elements
    * (the same physical-encoding-drift class that broke events.ts in
    * round 8). Normalize on read so every similarity operator sees one
    * element type regardless of the writer.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, _) =>
        raw.withColumn("embedding", col("embedding").cast("array<float>"))
      case _ => raw
    }
  }
}
