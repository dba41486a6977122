package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One named engine query plus (when SQL-expressible) its DuckDB oracle.
  *
  * Contract (see SparkEntry): the driver runs `run(spark, sfDir)`, writes
  * parquet, runs `oracle` in DuckDB over the same tables, sorts columns
  * by name and hash-compares values. Hence:
  *   - column names must match EXACTLY between both sides;
  *   - both sides carry a deterministic total ORDER BY;
  *   - double aggregation goes through exact DECIMAL sums (order-agnostic)
  *     cast back to DOUBLE, so partial-aggregation order can't flip bits.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** headline queries are timed by Bench */
    headline: Boolean = false)

object Q {
  /** Exact-sum helper: cast to decimal so the sum is associative. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Final cast back to double for a stable cross-engine physical type. */
  def asDouble(c: Column): Column = c.cast(DoubleType)
}
