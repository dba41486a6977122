package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler kernel shared by the interpreted eval and codegen paths.
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the oracle),
  * probed empirically rather than assumed from the textbook definition:
  *   - either side empty → 0.0 (NOT the textbook 1.0 for both-empty);
  *   - match window = max(l1,l2)/2 - 1, floored at 0 (so "ab"/"ba" → 0);
  *   - Winkler prefix boost (p=0.1, prefix capped at 4) applies only
  *     when jaro > 0.7 — the rapidfuzz-family boost threshold.
  *
  * Works on UTF-16 code units (Java chars), which matches the oracle on
  * all BMP text; the engine's tables are ASCII/BMP throughout.
  *
  * A top-level object so Scala emits static forwarders — codegen calls
  * `graft.functions.JaroWinklerAlgo.similarity(a, b)` directly.
  */
object JaroWinklerAlgo {
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched2 = new Array[Boolean](l2)
    // match pass: for each char of a, first unclaimed equal char of b
    // inside the window
    var m = 0
    var i = 0
    val idx1 = new Array[Int](math.min(l1, l2)) // a-positions of matches
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && a.charAt(i) == b.charAt(j)) {
          matched2(j) = true
          idx1(m) = i
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transposition pass: walk both match sequences in order
    var t = 0
    var j2 = 0
    var mi = 0
    while (mi < m) {
      while (!matched2(j2)) j2 += 1
      if (a.charAt(idx1(mi)) != b.charAt(j2)) t += 1
      j2 += 1
      mi += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}

/** Native string-similarity expressions (graft.functions house pattern:
  * fused primitive kernel, codegen via static call, interpreted
  * fallback — no UDF boxing in the pairwise-scoring hot path, where an
  * entity-resolution block join evaluates this once per candidate pair).
  */
object StringSimilarity {

  /** jaro_winkler(a, b): DOUBLE in [0,1]. NULL iff either input is NULL. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler expects (string, string), got ${left.dataType} / ${right.dataType}")
      }

    override def nullSafeEval(a: Any, b: Any): Any =
      JaroWinklerAlgo.similarity(
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.JaroWinklerAlgo.similarity($a, $b);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def jaro_winkler(a: Column, b: Column): Column =
    GraftColumnShim.column(
      JaroWinkler(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
