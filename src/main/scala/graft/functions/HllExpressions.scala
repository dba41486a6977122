package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** HyperLogLog as a first-class, PERSISTABLE sketch (Flajolet, Fusy,
  * Gandouet, Meunier 2007 — "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm").
  *
  * `approx_count_distinct` gives the estimate but swallows the sketch;
  * these expressions expose the registers as a `binary` column so a
  * 100 TB pipeline can sketch per partition/day, STORE the 4 KiB state,
  * and later merge arbitrary subsets without rescanning — the
  * count-distinct analogue of a partial aggregate that survives between
  * jobs.
  *
  *   - `hll_sketch(x)`  : aggregate raw values → registers (binary)
  *   - `hll_merge(s)`   : aggregate sketches → merged sketch (binary)
  *   - `hll_estimate(s)`: scalar registers → Long cardinality estimate
  *
  * Register updates and merges are pure byte-array max operations —
  * commutative, associative, idempotent — so the result is identical
  * under any partitioning, task retry, or merge order.
  */
object Hll {

  /** Precision: 2^12 = 4096 one-byte registers, ≈1.6% standard error. */
  val P: Int = 12
  val M: Int = 1 << P

  private val alphaM2: Double = (0.7213 / (1.0 + 1.079 / M)) * M.toDouble * M.toDouble

  def emptyRegisters(): Array[Byte] = new Array[Byte](M)

  /** Fold one 64-bit hash into the registers: top P bits pick the
    * register, the rank is 1 + leading zeros of the remaining bits.
    */
  def add(regs: Array[Byte], h: Long): Unit = {
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank = (if (w == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Elementwise max of `other` into `into` (associative, commutative). */
  def mergeInto(into: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(other.length == M, s"not a graft HLL sketch: ${other.length} registers")
    var i = 0
    while (i < M) { if (other(i) > into(i)) into(i) = other(i); i += 1 }
    into
  }

  /** Harmonic-mean estimate with the standard small-range (linear
    * counting) correction; 64-bit hashes need no large-range correction.
    */
  def estimate(regs: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alphaM2 / invSum
    val corrected =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
    math.round(corrected)
  }

  sealed abstract class HllAggBase extends TypedImperativeAggregate[Array[Byte]]
      with UnaryLike[Expression] {
    override def createAggregationBuffer(): Array[Byte] = emptyRegisters()
    override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = mergeInto(b, o)
    override def eval(b: Array[Byte]): Any = b
    // registers ARE the wire format — persistable as-is
    override def serialize(b: Array[Byte]): Array[Byte] = b
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
  }

  /** Aggregate raw values into a sketch. Seed pinned: sketches built by
    * different jobs over the same data are byte-identical, hence safely
    * mergeable across runs.
    */
  case class HllSketch(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends HllAggBase {
    override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) add(b, XxHash64Function.hash(v, child.dataType, 42L))
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): HllSketch =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): HllSketch =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): HllSketch = copy(child = c)
    override def prettyName: String = "hll_sketch"
  }

  /** Aggregate already-built sketches (e.g. read back from parquet). */
  case class HllMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends HllAggBase {
    override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) mergeInto(b, v.asInstanceOf[Array[Byte]])
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): HllMergeAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): HllMergeAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(c: Expression): HllMergeAgg = copy(child = c)
    override def prettyName: String = "hll_merge"
  }

  /** Registers → cardinality estimate. Runs once per GROUP (not per
    * row), so interpreted eval is fine — CodegenFallback keeps the
    * surrounding projection inside whole-stage codegen.
    */
  case class HllEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      estimate(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): HllEstimate = copy(child = c)
    override def prettyName: String = "hll_estimate"
  }

  def hll_sketch(c: Column): Column =
    GraftColumnShim.column(
      HllSketch(GraftColumnShim.expression(c)).toAggregateExpression())

  def hll_merge(c: Column): Column =
    GraftColumnShim.column(
      HllMergeAgg(GraftColumnShim.expression(c)).toAggregateExpression())

  def hll_estimate(c: Column): Column =
    GraftColumnShim.column(HllEstimate(GraftColumnShim.expression(c)))
}
