package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType}

/** Calendar-dimension generator
  * (reference: load_dim_dates.py:61-85 — SQL `EXPLODE(SEQUENCE(...))`).
  *
  * One row per day in [start, end] inclusive, with the smart key
  * `date_dim_id = y*10000+m*100+d`, ISO week-of-year and Spark
  * day-of-week (Sunday=1). Generated distributed: the `sequence` array is
  * built once and exploded — fine for calendar spans (10³-10⁴ rows).
  */
object DateDim {

  def dateDimension(spark: SparkSession, startDate: String, endDate: String): DataFrame = {
    val days = spark.range(1).select(
      explode(sequence(
        to_date(lit(startDate)), to_date(lit(endDate)),
        expr("interval 1 day"))).as("date_date"))
    days.select(
      KeyOps.smartDateKey(col("date_date")).as("date_dim_id"),
      col("date_date"),
      year(col("date_date")).cast(ShortType).as("year"),
      month(col("date_date")).cast(ByteType).as("month"),
      dayofmonth(col("date_date")).cast(ByteType).as("day"),
      weekofyear(col("date_date")).cast(ByteType).as("week_of_year"),
      dayofweek(col("date_date")).cast(ByteType).as("day_of_week"))
  }
}
