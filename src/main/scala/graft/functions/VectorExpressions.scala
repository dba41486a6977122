package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.SparkSession

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The higher-order-function rendition (zip_with + aggregate lambdas)
  * is semantically identical but allocates a lambda frame per element
  * and boxes every float; at 10⁹ vectors that IS the query cost. These
  * expressions run one fused primitive loop per row — no boxing, no
  * allocations — via codegen, with an interpreted eval fallback. The
  * math (sequential left-fold in double) matches the HOF version and
  * the DuckDB oracle bit-for-bit.
  */
object VectorExpressions {

  /** dot(a,b) / (||a||·||b||) in one pass. NULL if either side is NULL,
    * any element is NULL, lengths differ, or a norm is zero.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"cosine_sim expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
      }
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) { ${ev.isNull} = true; }
        |else {
        |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    final double $xi = (double) $a.getFloat($i);
        |    final double $yi = (double) $b.getFloat($i);
        |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |  }
        |  if (!${ev.isNull}) {
        |    if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
        |    else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
        |  }
        |}
        """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Column-level entry point. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnShim.column(
      CosineSim(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** SQL registration: SELECT cosine_sim(a.embedding, b.embedding). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
}
