package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Bitmap index aggregate over a DENSE NON-NEGATIVE integer id domain —
  * the EXACT member of the engine's sketch triad:
  *
  *   - [[Hll]]  : approximate distinct counts, unions only
  *   - [[Kmv]]  : approximate set expressions (∩ estimates)
  *   - Bitmap   : EXACT set algebra (∪ ∩ \ and exact cardinalities),
  *                bounded memory ONLY under a dense bounded id domain
  *
  * The domain bound (ids < 2^24, ≤ 2 MiB per bitmap) is a CONTRACT,
  * enforced loudly: a violating id throws rather than silently
  * truncating — at 100 TB the caller chooses bitmap for surrogate-key
  * domains (user ids, dense dictionary codes) and KMV/HLL for open
  * domains. State is a java.util.BitSet; merges are word-wise ORs —
  * commutative, associative, idempotent under any partitioning — and
  * the wire format (BitSet.toByteArray, trailing zeros trimmed) is a
  * pure function of the set, so bitmaps persist and re-merge across
  * jobs like the HLL/KMV sketches.
  *
  *   - `idset_agg(id)`        : aggregate ids → bitmap (binary)
  *   - `idset_merge(bm)`      : aggregate bitmaps → union bitmap
  *   - `idset_count(bm)`      : exact cardinality (Long)
  *   - `idset_and(a, b)`      : intersection bitmap
  *   - `idset_andnot(a, b)`   : difference bitmap (a \ b)
  *
  * Spark 4 ships its own `bitmap_construct_agg`/`bitmap_or_agg`/
  * `bitmap_count` (fixed 4 KiB buckets, caller-side bucketing, UNION
  * only) — this family exists for the ∩ and \ algebra those built-ins
  * lack, under distinct `idset_` names so neither shadows the other.
  */
object Bitmap {

  /** Domain bound: ids must sit in [0, MaxBit). 2^24 bits = 2 MiB. */
  val MaxBit: Long = 1L << 24

  type State = java.util.BitSet

  def emptyState(): State = new java.util.BitSet()

  def add(s: State, v: Long): Unit = {
    require(v >= 0 && v < MaxBit,
      s"idset_agg: id $v outside the dense-domain contract [0, $MaxBit) — " +
        "use kmv_sketch/hll_sketch for open id domains")
    s.set(v.toInt)
  }

  def serialize(s: State): Array[Byte] = s.toByteArray
  def deserialize(bytes: Array[Byte]): State = java.util.BitSet.valueOf(bytes)

  sealed abstract class BitmapAggBase extends TypedImperativeAggregate[State]
      with UnaryLike[Expression] {
    override def createAggregationBuffer(): State = emptyState()
    override def merge(b: State, o: State): State = { b.or(o); b }
    override def eval(b: State): Any = Bitmap.serialize(b)
    override def serialize(b: State): Array[Byte] = Bitmap.serialize(b)
    override def deserialize(bytes: Array[Byte]): State = Bitmap.deserialize(bytes)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
  }

  case class BitmapAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends BitmapAggBase {
    override def update(b: State, input: InternalRow): State = {
      val v = child.eval(input)
      if (v != null) {
        val id = v match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
          case s: java.lang.Short => s.longValue()
          case other => throw new IllegalArgumentException(
            s"idset_agg expects an integral id, got $other (${child.dataType})")
        }
        add(b, id)
      }
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): BitmapAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): BitmapAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): BitmapAgg =
      copy(child = c)
    override def prettyName: String = "idset_agg"
  }

  case class BitmapMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends BitmapAggBase {
    override def update(b: State, input: InternalRow): State = {
      val v = child.eval(input)
      if (v != null) b.or(Bitmap.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): BitmapMergeAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): BitmapMergeAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): BitmapMergeAgg =
      copy(child = c)
    override def prettyName: String = "idset_merge"
  }

  /** Once-per-group scalars — CodegenFallback keeps the surrounding
    * projection in whole-stage codegen (the [[Hll.HllEstimate]] note).
    */
  case class BitmapCount(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      deserialize(v.asInstanceOf[Array[Byte]]).cardinality().toLong
    override protected def withNewChildInternal(c: Expression): BitmapCount =
      copy(child = c)
    override def prettyName: String = "idset_count"
  }

  case class BitmapAnd(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val s = deserialize(a.asInstanceOf[Array[Byte]])
      s.and(deserialize(b.asInstanceOf[Array[Byte]]))
      serialize(s)
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): BitmapAnd = copy(left = l, right = r)
    override def prettyName: String = "idset_and"
  }

  case class BitmapAndNot(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val s = deserialize(a.asInstanceOf[Array[Byte]])
      s.andNot(deserialize(b.asInstanceOf[Array[Byte]]))
      serialize(s)
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): BitmapAndNot = copy(left = l, right = r)
    override def prettyName: String = "idset_andnot"
  }

  def idset_agg(c: Column): Column =
    GraftColumnShim.column(
      BitmapAgg(GraftColumnShim.expression(c)).toAggregateExpression())

  def idset_merge(c: Column): Column =
    GraftColumnShim.column(
      BitmapMergeAgg(GraftColumnShim.expression(c)).toAggregateExpression())

  def idset_count(c: Column): Column =
    GraftColumnShim.column(BitmapCount(GraftColumnShim.expression(c)))

  def idset_and(a: Column, b: Column): Column =
    GraftColumnShim.column(BitmapAnd(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  def idset_andnot(a: Column, b: Column): Column =
    GraftColumnShim.column(BitmapAndNot(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
