package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters sketch (Metwally et al., mergeable form per
  * Agarwal et al. "Mergeable Summaries"): a fixed-capacity aggregate
  * that finds the most frequent items in one pass.
  *
  * The exact rendition (groupBy token → count → top-k) shuffles every
  * distinct token; on a 100 TB corpus the token dictionary itself is
  * shuffle-dominant. This buffer caps at `m` entries per partition and
  * merges associatively, so the exchange carries O(partitions·m)
  * regardless of corpus or dictionary size — the same shape win as the
  * HLL sketch for distinct counts.
  *
  * Guarantees (n = total items observed): every item with true count
  * > n/m is present; a reported count overestimates its true count by
  * at most its `err` field, and `err < n/m`. When the observed distinct
  * count never exceeds `m`, counts are EXACT and `err` is 0 — which is
  * what lets a small-domain oracle hash-match the sketch while the same
  * operator stays safe on an unbounded domain.
  *
  * Buffer is a list scanned per update — O(m) per row, fine for the
  * m ≤ a-few-hundred sketches this is meant for (a hash-indexed buffer
  * is the constant-factor upgrade, not a different algorithm).
  */
object SpaceSavingAggregator {

  final case class Item(token: String, count: Long, err: Long)

  private def ord: Ordering[Item] = Ordering.by((i: Item) => (-i.count, i.token))

  final class SpaceSaving(m: Int) extends Aggregator[String, List[Item], List[Item]] {
    require(m > 0, "capacity must be positive")
    def zero: List[Item] = Nil

    def reduce(b: List[Item], tok: String): List[Item] =
      b.find(_.token == tok) match {
        case Some(it) => Item(tok, it.count + 1, it.err) :: b.filterNot(_.token == tok)
        case None if b.size < m => Item(tok, 1, 0) :: b
        case None =>
          // evict the minimum; the newcomer inherits its count as the
          // classic overestimate (err records how much)
          val victim = b.minBy(i => (i.count, i.token))
          Item(tok, victim.count + 1, victim.count) :: b.filterNot(_.token == victim.token)
      }

    def merge(x: List[Item], y: List[Item]): List[Item] = {
      // mergeable-summaries rule: an item absent from one side could
      // have been evicted there with count up to that side's minimum —
      // add it to both count and error, then keep the top m
      val minX = if (x.size < m) 0L else x.map(_.count).min
      val minY = if (y.size < m) 0L else y.map(_.count).min
      val xm = x.map(i => i.token -> i).toMap
      val ym = y.map(i => i.token -> i).toMap
      val combined = (xm.keySet ++ ym.keySet).toList.map { t =>
        val xi = xm.get(t)
        val yi = ym.get(t)
        Item(t,
          xi.map(_.count).getOrElse(minX) + yi.map(_.count).getOrElse(minY),
          xi.map(_.err).getOrElse(minX) + yi.map(_.err).getOrElse(minY))
      }
      combined.sorted(ord).take(m)
    }

    def finish(r: List[Item]): List[Item] = r.sorted(ord)
    def bufferEncoder: Encoder[List[Item]] = Enc.listItem
    def outputEncoder: Encoder[List[Item]] = Enc.listItem
  }

  private object Enc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val item: Encoder[Item] = Encoders.product[Item]
    val listItem: Encoder[List[Item]] =
      ExpressionEncoder[List[Item]]()(
        scala.reflect.runtime.universe.typeTag[List[Item]])
  }

  /** Column-level aggregate: space_saving(m)(tokenCol). */
  def spaceSaving(m: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new SpaceSaving(m), Encoders.STRING)
}
