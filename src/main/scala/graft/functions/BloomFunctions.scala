package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column builders over Spark's built-in Bloom-filter sketch
  * (`org.apache.spark.util.sketch.BloomFilter`, the engine-internal
  * aggregate behind runtime filter injection — public classes, but not
  * registered as SQL functions, hence these builders).
  *
  * The 100 TB decontamination posture: an exact distinct benchmark-gram
  * relation can outgrow the broadcast ceiling, while the Bloom filter is
  * FIXED-SIZE (numBits picks the budget), mergeable (map-side partials),
  * and one-sided — `might_contain` has NO false negatives, so using it
  * as a pre-filter can never lose a truly contaminated document; false
  * positives only send a bounded extra fraction to the exact verify.
  */
object BloomFunctions {

  /** Aggregate a LONG column into a Bloom filter (binary). */
  def bloomFilterAgg(items: Column, estimatedItems: Long, numBits: Long): Column =
    GraftColumnShim.column(
      new BloomFilterAggregate(GraftColumnShim.expression(items),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** One-sided membership probe against a [[bloomFilterAgg]] binary. */
  def mightContain(bloom: Column, value: Column): Column =
    GraftColumnShim.column(BloomFilterMightContain(
      GraftColumnShim.expression(bloom), GraftColumnShim.expression(value)))

  /** A one-row DataFrame (e.g. the [[bloomFilterAgg]] result) as a
    * scalar-subquery Column — `might_contain` requires its filter side
    * to be a constant or scalar subquery, exactly as SQL would write
    * `might_contain((SELECT bloom_filter_agg(...) FROM b), x)`. Keeps
    * the filter build inside the one query plan: no driver collect, the
    * subquery executes once and broadcasts its value to every task.
    */
  def scalarOf(df: DataFrame): Column =
    GraftColumnShim.column(ScalarSubquery(df.queryExecution.analyzed))
}
