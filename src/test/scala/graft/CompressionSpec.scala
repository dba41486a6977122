package graft

import org.apache.spark.sql.functions._
import graft.functions.{CompressionExpressions, DeflateAlgo}
import org.apache.spark.unsafe.types.UTF8String

/** [[graft.functions.CompressionExpressions]] — the deflate-based
  * compression-ratio quality signal. The codec output has no SQL
  * oracle, so the signal's SEMANTICS are pinned here: repetitive text
  * scores far below varied text, the score is deterministic, and the
  * size respects deflate's worst-case bound.
  */
class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private def zlen(s: String): Int =
    DeflateAlgo.deflateLen(UTF8String.fromString(s))

  test("repetitive text compresses an order of magnitude below varied text") {
    val repetitive = "spam ham " * 1000                       // 9000 bytes
    val varied = (0 until 1000)
      .map(i => ((i * 2654435761L) % 100000).toString).mkString(" ")
    val rRatio = zlen(repetitive).toDouble / repetitive.length
    val vRatio = zlen(varied).toDouble / varied.length
    assert(rRatio < 0.05, s"repetitive ratio $rRatio")
    assert(vRatio > 0.3, s"varied ratio $vRatio")
  }

  test("deterministic, bounded, and empty-safe") {
    val s = "the quick brown fox jumps over the lazy dog " * 7
    assert(zlen(s) == zlen(s))
    assert(zlen(s) > 0 && zlen(s) <= s.getBytes("UTF-8").length + 64)
    assert(zlen("") == 0)
  }

  test("doubling repetitive input grows the compressed size sublinearly") {
    val s = "boilerplate header " * 200
    assert(zlen(s + s) < 2 * zlen(s))
  }

  test("expression is NULL-safe and matches the kernel through the plan") {
    val df = Seq(Some("aaaa bbbb aaaa bbbb"), Some(""), None)
      .toDF("text")
      .repartition(2)
      .withColumn("z", CompressionExpressions.deflate_len(col("text")))
    df.collect().foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getInt(1) == zlen(r.getString(0)))
    }
  }

  test("q_compression_ratio contract holds on real documents") {
    val rows = graft.queries.TextQueries.qCompressionRatio
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(2)))
  }
}
