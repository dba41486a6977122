package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Count-Min sketch (Cormode & Muthukrishnan): a fixed-size mergeable
  * frequency table — depth×width counters; an item increments one
  * counter per row (row d at column hash_d(item)); its estimate is the
  * MIN over its depth counters. Never underestimates; overestimates by
  * at most ε·N (ε ≈ e/width) with probability 1−δ (δ ≈ e^−depth).
  *
  * Where [[SpaceSavingAggregator]] answers "what are the heavy items",
  * this answers POINT queries — "how often did THIS item occur" — for
  * items chosen after the pass, still in O(depth·width) memory however
  * large the stream or its dictionary. The exchange carries
  * O(partitions·depth·width) fixed bytes; merge is elementwise sum
  * (exactly = the sketch of the concatenated streams, so partial
  * aggregation is lossless).
  *
  * Split design, deliberately: hashing happens in the COLUMN layer
  * ([[positions]] — codegen'd xxhash64), and the typed Aggregator only
  * increments the supplied positions. Build and probe therefore share
  * one hash definition in one place, and [[estimate]] is a pure Column
  * expression over the persisted sketch — usable in any later query
  * without re-running the aggregation.
  */
object CountMinSketch {

  /** The depth hash positions of `item`: row d probes column
    * xxhash64(d, item) mod width. Deterministic, codegen'd, shared by
    * build ([[countMin]]) and probe ([[estimate]]).
    */
  def positions(item: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(d =>
      pmod(xxhash64(lit(d), item), lit(width)).cast(IntegerType)): _*)

  /** Typed aggregator over pre-hashed position arrays: buffer is the
    * flat depth×width counter table (row-major), reduce increments one
    * counter per row, merge is elementwise sum.
    */
  final class PosIncrement(depth: Int, width: Int)
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    require(depth > 0 && width > 0, s"depth/width must be positive: $depth×$width")
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], pos: Seq[Int]): Array[Long] = {
      var d = 0
      while (d < depth) { b(d * width + pos(d)) += 1L; d += 1 }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = Enc.longArray
    def outputEncoder: Encoder[Seq[Long]] = Enc.longSeq
  }

  private object Enc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import scala.reflect.runtime.universe.typeTag
    val longArray: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()(typeTag[Array[Long]])
    val longSeq: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()(typeTag[Seq[Long]])
    val intSeq: Encoder[Seq[Int]] =
      ExpressionEncoder[Seq[Int]]()(typeTag[Seq[Int]])
  }

  /** Column-level aggregate: count_min(depth, width)(positions(item)). */
  def countMin(depth: Int, width: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new PosIncrement(depth, width), Enc.intSeq)

  /** Point-frequency estimate of `item` from a sketch column built with
    * the same (depth, width): min over the item's depth counters.
    * Pure expression — runs against a stored sketch without any
    * re-aggregation (element_at is 1-based).
    */
  def estimate(sketch: Column, item: Column, depth: Int, width: Int): Column =
    array_min(array((0 until depth).map(d =>
      element_at(sketch,
        lit(d * width) +
          pmod(xxhash64(lit(d), item), lit(width)).cast(IntegerType) + lit(1))): _*))
}
