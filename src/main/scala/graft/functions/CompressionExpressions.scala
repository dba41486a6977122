package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.unsafe.types.UTF8String

/** Deflate kernel for the compression-ratio quality signal (CCNet /
  * Gopher-style): highly repetitive machine-generated text compresses
  * far below natural prose, so compressed-size ÷ raw-size is a cheap,
  * language-agnostic repetitiveness score.
  *
  * One `java.util.zip.Deflater` per thread (ThreadLocal, reset between
  * rows): Deflater wraps native zlib state whose allocation dominates
  * small inputs, and rows of one Spark task run on one thread. Level
  * and strategy are pinned so the score is a stable function of the
  * bytes. Top-level object → static forwarders for codegen.
  */
object DeflateAlgo {
  private val LEVEL = 6
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(LEVEL, /*nowrap=*/ true)
  }

  /** Compressed byte length of the UTF-8 bytes of `s` under raw
    * deflate, level 6. Empty input → 0 (skip the codec: zlib emits a
    * 2-byte empty block, which would make ratio undefined ÷ 0 anyway).
    */
  def deflateLen(s: UTF8String): Int = {
    val in = s.getBytes
    if (in.length == 0) return 0
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

object CompressionExpressions {

  /** deflate_len(text): INT compressed size of the UTF-8 encoding.
    * NULL iff input is NULL.
    */
  case class DeflateLen(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"deflate_len expects string, got $t")
      }

    override def nullSafeEval(v: Any): Any =
      DeflateAlgo.deflateLen(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.DeflateAlgo.deflateLen($c)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def deflate_len(c: Column): Column =
    GraftColumnShim.column(DeflateLen(GraftColumnShim.expression(c)))
}
