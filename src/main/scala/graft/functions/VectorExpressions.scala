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

  /** Spark's `round(x, 0)` on DoubleType is
    * `BigDecimal.valueOf(x).setScale(0, HALF_UP)` (shortest-decimal
    * conversion, then decimal rounding) — replicated exactly here so
    * the fused expression below is bit-identical to the
    * `CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)` HOF
    * spelling it replaces (Math.round would differ on negatives and on
    * pathological near-half doubles).
    */
  def roundMicros(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Nearest centroid in squared L2 over integer micros, one fused
    * primitive loop per row: quantize the vector once into a local
    * long[], then scan the K·D literal model accumulating d² in long,
    * tracking the (d² asc, label asc) argmin — the codegen rendition
    * of `array_min(transform(model, c -> struct(aggregate(zip_with(
    * …)))))`, which is CodegenFallback (higher-order functions carry
    * no doGenCode) and cost ~600 µs/row interpreted: the whole
    * q_centroid_classify scoring pass, adjudicated r12.
    *
    * Inputs: vec `array<float>` or `array<double>`; model
    * `array<struct<lab:int, cm:array<bigint>>>` (a fitted-parameter
    * literal). Returns `struct<d2:bigint, lab:int>`; NULL when the
    * vector is NULL, the model is empty, any vector element is NULL,
    * or a centroid's dimensionality differs from the vector's (the
    * HOF spelling nulled d² on those element/shape edges; this
    * expression nulls the whole struct — same downstream nulls for
    * every well-formed input).
    */
  case class NearestCentroidMicros(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = StructType(Seq(
      StructField("d2", LongType, nullable = false),
      StructField("lab", IntegerType, nullable = false)))
    override def nullable: Boolean = true

    private lazy val vecIsFloat: Boolean =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType | DoubleType, _),
              ArrayType(StructType(Array(
                StructField("lab", IntegerType, _, _),
                StructField("cm", ArrayType(LongType, _), _, _))), _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "nearest_centroid_micros expects (array<float|double>, " +
              s"array<struct<lab:int,cm:array<bigint>>>), got ${left.dataType} / ${right.dataType}")
      }
    }

    override def nullSafeEval(v: Any, m: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val mod = m.asInstanceOf[ArrayData]
      val k = mod.numElements()
      val n = x.numElements()
      if (k == 0) return null
      val xm = new Array[Long](n)
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        xm(i) = roundMicros(
          if (vecIsFloat) x.getFloat(i).toDouble else x.getDouble(i))
        i += 1
      }
      var bestD2 = 0L; var bestLab = 0; var found = false
      var c = 0
      while (c < k) {
        val st = mod.getStruct(c, 2)
        val lab = st.getInt(0)
        val cm = st.getArray(1)
        if (cm.numElements() != n) return null
        var d2 = 0L; var j = 0
        while (j < n) {
          val dlt = xm(j) - cm.getLong(j)
          d2 += dlt * dlt; j += 1
        }
        if (!found || d2 < bestD2 || (d2 == bestD2 && lab < bestLab)) {
          bestD2 = d2; bestLab = lab; found = true
        }
        c += 1
      }
      InternalRow(bestD2, bestLab)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val k = ctx.freshName("k")
        val xm = ctx.freshName("xm"); val i = ctx.freshName("i")
        val c = ctx.freshName("c"); val j = ctx.freshName("j")
        val st = ctx.freshName("st"); val cm = ctx.freshName("cm")
        val lab = ctx.freshName("lab"); val d2 = ctx.freshName("d2")
        val dlt = ctx.freshName("dlt")
        val bestD2 = ctx.freshName("bestD2"); val bestLab = ctx.freshName("bestLab")
        val found = ctx.freshName("found")
        val getElem = if (vecIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val cls = "graft.functions.VectorExpressions"
        s"""
        |final int $n = $a.numElements();
        |final int $k = $b.numElements();
        |if ($k == 0) { ${ev.isNull} = true; }
        |else {
        |  final long[] $xm = new long[$n];
        |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
        |    if ($a.isNullAt($i)) { ${ev.isNull} = true; }
        |    else { $xm[$i] = $cls.roundMicros($getElem); }
        |  }
        |  long $bestD2 = 0L; int $bestLab = 0; boolean $found = false;
        |  for (int $c = 0; $c < $k && !${ev.isNull}; $c++) {
        |    final org.apache.spark.sql.catalyst.InternalRow $st = $b.getStruct($c, 2);
        |    final int $lab = $st.getInt(0);
        |    final org.apache.spark.sql.catalyst.util.ArrayData $cm = $st.getArray(1);
        |    if ($cm.numElements() != $n) { ${ev.isNull} = true; }
        |    else {
        |      long $d2 = 0L;
        |      for (int $j = 0; $j < $n; $j++) {
        |        final long $dlt = $xm[$j] - $cm.getLong($j);
        |        $d2 += $dlt * $dlt;
        |      }
        |      if (!$found || $d2 < $bestD2 || ($d2 == $bestD2 && $lab < $bestLab)) {
        |        $bestD2 = $d2; $bestLab = $lab; $found = true;
        |      }
        |    }
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |      new Object[]{ java.lang.Long.valueOf($bestD2), java.lang.Integer.valueOf($bestLab) });
        |  }
        |}
        """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Argmax-cosine cell id over a literal centroid model, one fused
    * primitive loop per row — the codegen rendition of the
    * `aggregate(model, seed, (acc, ce) -> if cosine > acc.score …)`
    * fold in [[graft.similarity.Similarity.nearestCentroid]], which is
    * CodegenFallback (higher-order functions carry no doGenCode) and
    * dominated k-means fitting: every Lloyd iteration paid an
    * interpreted 16-cell × 64-dim fold per row.
    *
    * Semantics match the HOF fold exactly: cells scan in model order,
    * a cell wins only on STRICT improvement (ties keep the earlier
    * cell), cells whose cosine is undefined (length mismatch, NULL
    * cv, zero norm) are skipped, and the result is NULL when no cell
    * scores (empty model, NULL vector element) — the Column wrapper
    * coalesces that to the HOF's seed cid -1. Per-cell scores use the
    * same interleaved double accumulation as [[CosineSim]], so
    * assignments are bit-identical to the HOF spelling.
    *
    * Inputs: vec `array<float>`; model
    * `array<struct<cid:int, cv:array<float>>>`. Returns int cid.
    */
  case class NearestCosineCell(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _),
              ArrayType(StructType(Array(
                StructField("cid", IntegerType, _, _),
                StructField("cv", ArrayType(FloatType, _), _, _))), _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "nearest_cosine_cell expects (array<float>, " +
              s"array<struct<cid:int,cv:array<float>>>), got " +
              s"${left.dataType} / ${right.dataType}")
      }
    }

    override def nullSafeEval(v: Any, m: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val mod = m.asInstanceOf[ArrayData]
      val n = x.numElements()
      val k = mod.numElements()
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null // every cell's cosine is NULL
        i += 1
      }
      var best = -2.0; var bestCid = 0; var found = false
      var c = 0
      while (c < k) {
        if (!mod.isNullAt(c)) {
          val st = mod.getStruct(c, 2)
          if (!st.isNullAt(1)) {
            val cv = st.getArray(1)
            if (cv.numElements() == n) {
              var dot = 0.0; var na = 0.0; var nb = 0.0
              var ok = true
              var j = 0
              while (j < n && ok) {
                if (cv.isNullAt(j)) ok = false
                else {
                  val xj = x.getFloat(j).toDouble
                  val yj = cv.getFloat(j).toDouble
                  dot += xj * yj; na += xj * xj; nb += yj * yj
                  j += 1
                }
              }
              if (ok && na != 0.0 && nb != 0.0) {
                val s = dot / (math.sqrt(na) * math.sqrt(nb))
                if (s > best) { best = s; bestCid = st.getInt(0); found = true }
              }
            }
          }
        }
        c += 1
      }
      if (found) bestCid else null
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val k = ctx.freshName("k")
        val i = ctx.freshName("i"); val c = ctx.freshName("c")
        val j = ctx.freshName("j"); val st = ctx.freshName("st")
        val cv = ctx.freshName("cv"); val dot = ctx.freshName("dot")
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val xj = ctx.freshName("xj"); val yj = ctx.freshName("yj")
        val ok = ctx.freshName("ok"); val s = ctx.freshName("s")
        val best = ctx.freshName("best"); val bestCid = ctx.freshName("bestCid")
        val found = ctx.freshName("found")
        s"""
        |final int $n = $a.numElements();
        |final int $k = $b.numElements();
        |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
        |  if ($a.isNullAt($i)) { ${ev.isNull} = true; }
        |}
        |if (!${ev.isNull}) {
        |  double $best = -2.0; int $bestCid = 0; boolean $found = false;
        |  for (int $c = 0; $c < $k; $c++) {
        |    if (!$b.isNullAt($c)) {
        |      final org.apache.spark.sql.catalyst.InternalRow $st = $b.getStruct($c, 2);
        |      if (!$st.isNullAt(1)) {
        |        final org.apache.spark.sql.catalyst.util.ArrayData $cv = $st.getArray(1);
        |        if ($cv.numElements() == $n) {
        |          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |          boolean $ok = true;
        |          for (int $j = 0; $j < $n && $ok; $j++) {
        |            if ($cv.isNullAt($j)) { $ok = false; }
        |            else {
        |              final double $xj = (double) $a.getFloat($j);
        |              final double $yj = (double) $cv.getFloat($j);
        |              $dot += $xj * $yj; $na += $xj * $xj; $nb += $yj * $yj;
        |            }
        |          }
        |          if ($ok && $na != 0.0 && $nb != 0.0) {
        |            final double $s = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |            if ($s > $best) { $best = $s; $bestCid = $st.getInt(0); $found = true; }
        |          }
        |        }
        |      }
        |    }
        |  }
        |  if ($found) { ${ev.value} = $bestCid; } else { ${ev.isNull} = true; }
        |}
        """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Column-level entry point for [[NearestCosineCell]]. */
  def nearest_cosine_cell(vec: Column, model: Column): Column =
    GraftColumnShim.column(NearestCosineCell(
      GraftColumnShim.expression(vec), GraftColumnShim.expression(model)))

  /** Column-level entry point. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnShim.column(
      CosineSim(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column-level entry point for [[NearestCentroidMicros]]. */
  def nearest_centroid_micros(vec: Column, model: Column): Column =
    GraftColumnShim.column(NearestCentroidMicros(
      GraftColumnShim.expression(vec), GraftColumnShim.expression(model)))

  /** SQL registration: SELECT cosine_sim(a.embedding, b.embedding). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
}
