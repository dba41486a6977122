package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.Row

/** Surrogate / smart-key assignment. */
object KeyOps {

  /** Smart date key `y*10000 + m*100 + d`
    * (reference: load_fct_flights.py:49-53; load_dim_dates.py:73-77).
    */
  def smartDateKey(ts: Column): Column =
    (year(ts) * 10000 + month(ts) * 100 + dayofmonth(ts)).cast(IntegerType)

  /** Parity surrogate key: `row_number() OVER (ORDER BY orderCol)`
    * (reference: load_dim_airports.py:50; load_dim_aircrafts.py:118-122).
    *
    * Global window — all rows pass through ONE partition. Fine for
    * dimension tables (10⁴–10⁶ rows); a documented scale hazard beyond
    * that. For anything fact-sized use [[scalableSurrogateKey]].
    */
  def surrogateKey(df: DataFrame, idCol: String, orderCol: String): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(col(orderCol))))

  /** Scale-safe dense surrogate key, 1-based, ordered by `orderCols`.
    *
    * Sort → `zipWithIndex` keeps every partition parallel (no single
    * WindowExec partition): one range-shuffle for the sort, one O(#parts)
    * driver pass for the per-partition offsets. Ids are identical to the
    * global-window variant for a total, duplicate-free ordering.
    */
  def scalableSurrogateKey(df: DataFrame, idCol: String, orderCols: String*): DataFrame = {
    val spark = df.sparkSession
    val ord = orderCols.map(col)
    val sorted = df.repartitionByRange(ord: _*).sortWithinPartitions(ord: _*)
    val withId = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    spark.createDataFrame(withId, schema)
  }
}
