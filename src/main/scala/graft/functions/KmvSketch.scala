package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** KMV / theta sketch (Bar-Yossef et al. 2002; Dasgupta, Lang, Rhodes,
  * Thaler, "A Framework for Estimating Stream Expression Cardinalities",
  * and the Apache DataSketches theta family — public literature):
  * keep the K smallest 64-bit hashes of a distinct-value stream.
  *
  * Where [[Hll]] only counts, KMV supports SET EXPRESSIONS: because
  * each sketch is a uniform sample of the hash space below its theta
  * threshold, two sketches can estimate |A ∩ B| — the question HLL
  * cannot answer (inclusion–exclusion on HLL unions loses all
  * precision on small overlaps). Pipeline uses: cross-source audience
  * overlap, contamination overlap between corpus snapshots, join-key
  * overlap estimation before committing to a join strategy.
  *
  *   - `kmv_sketch(x)`       : aggregate raw values → sketch (binary)
  *   - `kmv_merge(s)`        : aggregate sketches → union sketch
  *   - `kmv_estimate(s)`     : sketch → distinct-count estimate (Long)
  *   - `kmv_intersect(a, b)` : two sketches → |A ∩ B| estimate (Long)
  *
  * Determinism: the hash is xxhash64 seed-42 (the [[Hll]] pin), the
  * state is a sorted set — commutative, associative, idempotent under
  * any partitioning or merge order — and the wire format is the sorted
  * hash array, so sketches persist and re-merge across jobs.
  *
  * Exact regime: while fewer than K distinct values have been seen the
  * sketch IS the full hash set and every estimate is exact — the
  * oracle contract (the SpaceSaving/CMS discipline: gate-scale data
  * stays in the exact regime; at 100 TB the same code degrades to
  * ±1/√K relative error, ~0.8% at the default K).
  */
object Kmv {

  /** Nominal entries: 16384 longs = 128 KiB per sketch, ~0.8% error. */
  val K: Int = 16384

  /** Unsigned-order TreeSet of raw hash values. */
  type State = java.util.TreeSet[java.lang.Long]

  private val unsignedOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b)

  def emptyState(): State = new java.util.TreeSet[java.lang.Long](unsignedOrder)

  /** Keep h iff it is among the K smallest seen (unsigned). O(log K). */
  def add(s: State, h: Long): Unit =
    if (s.size < K) { s.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, s.last) < 0) {
      if (s.add(h)) s.remove(s.last)
      ()
    }

  def mergeInto(into: State, other: State): State = {
    val it = other.iterator()
    while (it.hasNext) add(into, it.next())
    into
  }

  def serialize(s: State): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(s.size * 8)
    val it = s.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val s = emptyState()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) s.add(bb.getLong)
    s
  }

  /** Hashes as a sorted-unsigned array (the wire format, parsed). */
  private def sortedHashes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (bb.hasRemaining) { out(i) = bb.getLong; i += 1 }
    out // serialized in unsigned order already
  }

  /** theta = (K-th smallest hash) / 2^64 as a fraction of the hash
    * space; 1.0 while in the exact regime. Top 53 bits of the unsigned
    * hash as a dyadic fraction — exact in double, no sign gymnastics.
    */
  private def theta(hs: Array[Long]): Double =
    if (hs.length < K) 1.0
    else (hs(hs.length - 1) >>> 11).toDouble / 9007199254740992.0

  def estimate(bytes: Array[Byte]): Long = {
    val hs = sortedHashes(bytes)
    if (hs.length < K) hs.length.toLong
    else math.round((K - 1).toDouble / theta(hs))
  }

  /** |A ∩ B| estimate: matches below min(thetaA, thetaB), scaled. In
    * the exact regime (both sides full sets) this is the exact
    * intersection count.
    */
  def estimateIntersect(aBytes: Array[Byte], bBytes: Array[Byte]): Long = {
    val a = sortedHashes(aBytes)
    val b = sortedHashes(bBytes)
    val th = math.min(theta(a), theta(b))
    // merge-walk match count over the sorted-unsigned arrays; every
    // retained hash is below its own sketch's theta, hence below th
    // on whichever side has the smaller theta — count only values
    // present in BOTH, which are below th by construction
    var i = 0; var j = 0; var matches = 0L
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compareUnsigned(a(i), b(j))
      if (c == 0) { matches += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    if (th >= 1.0) matches else math.round(matches.toDouble / th)
  }

  sealed abstract class KmvAggBase extends TypedImperativeAggregate[State]
      with UnaryLike[Expression] {
    override def createAggregationBuffer(): State = emptyState()
    override def merge(b: State, o: State): State = mergeInto(b, o)
    override def eval(b: State): Any = Kmv.serialize(b)
    override def serialize(b: State): Array[Byte] = Kmv.serialize(b)
    override def deserialize(bytes: Array[Byte]): State = Kmv.deserialize(bytes)
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
  }

  case class KmvSketchAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends KmvAggBase {
    override def update(b: State, input: InternalRow): State = {
      val v = child.eval(input)
      if (v != null) add(b, XxHash64Function.hash(v, child.dataType, 42L))
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
      copy(child = c)
    override def prettyName: String = "kmv_sketch"
  }

  case class KmvMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends KmvAggBase {
    override def update(b: State, input: InternalRow): State = {
      val v = child.eval(input)
      if (v != null) mergeInto(b, Kmv.deserialize(v.asInstanceOf[Array[Byte]]))
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): KmvMergeAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KmvMergeAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): KmvMergeAgg =
      copy(child = c)
    override def prettyName: String = "kmv_merge"
  }

  /** Once-per-group scalars — CodegenFallback keeps the surrounding
    * projection in whole-stage codegen (the [[Hll.HllEstimate]] note).
    */
  case class KmvEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      estimate(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): KmvEstimate =
      copy(child = c)
    override def prettyName: String = "kmv_estimate"
  }

  case class KmvIntersect(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      estimateIntersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): KmvIntersect = copy(left = l, right = r)
    override def prettyName: String = "kmv_intersect"
  }

  def kmv_sketch(c: Column): Column =
    GraftColumnShim.column(
      KmvSketchAgg(GraftColumnShim.expression(c)).toAggregateExpression())

  def kmv_merge(c: Column): Column =
    GraftColumnShim.column(
      KmvMergeAgg(GraftColumnShim.expression(c)).toAggregateExpression())

  def kmv_estimate(c: Column): Column =
    GraftColumnShim.column(KmvEstimate(GraftColumnShim.expression(c)))

  def kmv_intersect(a: Column, b: Column): Column =
    GraftColumnShim.column(KmvIntersect(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
