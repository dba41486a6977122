package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Cross-engine-deterministic arithmetic helpers.
  *
  * `round(x, 6)` applied to an exact-rational quotient (intersection /
  * union, hits/total, count/total) is NOT portable: such quotients land
  * on 6-decimal half boundaries, where Java's shortest-decimal HALF_UP
  * (Spark) and binary-double rounding (DuckDB/C) break the tie in
  * opposite directions — observed live on sf0.1 centroid data. Organic
  * doubles (cosines, z-scores) essentially never sit exactly on these
  * boundaries; integer ratios do, at roughly 1/denominator frequency.
  */
object DetMath {

  /** round(num/den, 6) with half-away ties, computed EXACTLY:
    * floor((2·num·10⁶ + den) / (2·den)) / 10⁶. Every intermediate is an
    * exactly-representable double for nonnegative integer num < ~4.5e9
    * and positive integer den, the single inexact step is one IEEE
    * division whose floor is provably correct below 2^53, and the same
    * formula text runs in any engine.
    */
  def ratio6(num: Column, den: Column): Column = {
    val n = num.cast(DoubleType)
    val d = den.cast(DoubleType)
    (floor((lit(2.0) * n * lit(1000000.0) + d) / (lit(2.0) * d))
      .cast(DoubleType) / lit(1000000.0))
  }

  /** The DuckDB-dialect mirror of [[ratio6]] — interpolate into oracle
    * SQL so both engines run the identical formula.
    */
  def ratio6Sql(num: String, den: String): String =
    s"floor((2.0 * ($num) * 1000000 + ($den)) / (2.0 * ($den))) / 1000000"
}
