package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass grouped top-k: a typed `Aggregator` whose buffer holds at
  * most k (score, id) pairs, merged associatively across partitions.
  *
  * The window-function rendition (row_number over score desc, filter
  * rn<=k) must sort every group's full row set; this aggregator's
  * partial buffers cap at k entries per partition per group, so the
  * shuffle carries O(groups·k) data regardless of input size — the
  * difference between sorting 100 TB and shuffling kilobytes.
  *
  * Ordering: score DESC, id ASC tiebreak — fully deterministic.
  */
object TopKAggregator {

  final case class Scored(score: Double, id: Long)

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  final class TopK(k: Int) extends Aggregator[Scored, List[Scored], List[Scored]] {
    def zero: List[Scored] = Nil
    def reduce(b: List[Scored], a: Scored): List[Scored] = trim(a :: b)
    def merge(x: List[Scored], y: List[Scored]): List[Scored] = trim(x ::: y)
    def finish(r: List[Scored]): List[Scored] = r.sorted(ord)
    private def trim(l: List[Scored]): List[Scored] = l.sorted(ord).take(k)
    def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoderHelper.listScored
    def outputEncoder: Encoder[List[Scored]] = ExpressionEncoderHelper.listScored
  }

  private object ExpressionEncoderHelper {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val scored: Encoder[Scored] = Encoders.product[Scored]
    val listScored: Encoder[List[Scored]] =
      ExpressionEncoder[List[Scored]]()(
        scala.reflect.runtime.universe.typeTag[List[Scored]])
  }

  /** Column-level aggregate function: topk(struct(score, id)). */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new TopK(k), Encoders.product[Scored])
}
