package graft.jobs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType}
import graft.ops.IncrementalOps
import graft.schemas.Schemas

/** Flight-record source seam. The reference fetches from the OpenSky
  * REST API on the driver (reference: extract_flights.py:103-117) —
  * driver-side I/O either way, so a trait keeps semantics identical
  * while letting tests inject fixtures.
  */
trait FlightSource {
  /** Raw rows shaped like Schemas.srcFlights MINUS the three derived
    * partition columns (they are computed by the job).
    */
  def fetch(airportIcao: String, beginTs: Long, endTs: Long, direction: String): Seq[Row]
}

/** Daily flight extract → partitioned parquet lake, idempotent append
  * (reference: extract_flights.py:14-100).
  *
  * Pipeline: per direction fetch → explicit-schema DataFrame → NULL
  * check on the partition-driving column → derive flight_ts + y/m/d →
  * unionByName accumulate → diff against the existing partition →
  * append only the delta. Re-running a day appends zero rows.
  */
object ExtractFlights {

  val directions = Seq("departure", "arrival")

  /** Column driving partition derivation per direction
    * (reference: extract_flights.py:45-46 — firstSeen for departures,
    * lastSeen for arrivals).
    */
  def partitionDriver(direction: String): String =
    if (direction == "departure") "firstSeen" else "lastSeen"

  /** The API payload shape: srcFlights minus the derived partition cols. */
  val apiSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Schemas.srcFlights.fields.dropRight(3))

  def derivePartitionCols(df: DataFrame, driver: String): DataFrame =
    df.withColumn("__ts", timestamp_seconds(col(driver)))
      .withColumn("flight_year", year(col("__ts")).cast(ShortType))
      .withColumn("flight_month", month(col("__ts")).cast(ByteType))
      .withColumn("flight_day", dayofmonth(col("__ts")).cast(ByteType))
      .drop("__ts")

  /** Runs the extract; returns the number of rows appended. */
  def run(spark: SparkSession, source: FlightSource, lakeDir: String,
          airportIcao: String, beginTs: Long, endTs: Long): Long = {
    import scala.jdk.CollectionConverters._

    // empty-seed accumulator with the full schema
    // (reference: extract_flights.py:29, 66 — unionByName into empty DF)
    var acc = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), Schemas.srcFlights)

    directions.foreach { dir =>
      val rows = source.fetch(airportIcao, beginTs, endTs, dir)
      val df = spark.createDataFrame(rows.asJava, apiSchema)
      val driver = partitionDriver(dir)
      val nullCnt = df.filter(col(driver).isNull).count()
      if (nullCnt > 0)
        System.err.println(
          s"[extract] WARN: $nullCnt $dir rows have NULL $driver; they land in the null partition")
      acc = acc.unionByName(derivePartitionCols(df, driver))
    }

    val (y, m, d) = {
      val t = java.time.Instant.ofEpochSecond(beginTs).atZone(java.time.ZoneOffset.UTC)
      (t.getYear, t.getMonthValue, t.getDayOfMonth)
    }

    // Hadoop-FS probe, not java.io.File — the lake may be hdfs://, s3a://
    // (reference: extract_flights.py:68-79)
    val lakeExists = graft.ops.Fs.exists(lakeDir)
    val delta =
      if (!lakeExists) acc
      else {
        val current = spark.read.parquet(lakeDir)
          .filter(col("flight_year") === y && col("flight_month") === m && col("flight_day") === d)
        // count-equality short-circuit (reference: extract_flights.py:82-84)
        if (current.count() == acc.count()) acc.limit(0)
        else IncrementalOps.exceptNew(acc, current)
      }

    val n = delta.count()
    if (n > 0)
      delta.write.mode("append")
        .partitionBy("flight_year", "flight_month", "flight_day")
        .parquet(lakeDir)
    n
  }
}
