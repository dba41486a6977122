package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ranking

/** [[graft.ops.Ranking.rankByGroup]] — the band-decomposed grouped
  * rank — cross-checked row-for-row against the monolithic
  * `rank().over(Window.partitionBy(g).orderBy(v))` it replaces.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def crossCheck(rows: Seq[(String, Double)], bands: Int): Unit = {
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val got = Ranking.rankByGroup(df, "g", "v", bands)
      .select($"id", $"__rk", $"__n")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val w = Window.partitionBy($"g").orderBy($"v")
    val n = Window.partitionBy($"g")
    val want = df
      .withColumn("rk", rank().over(w))
      .withColumn("n", count(lit(1)).over(n))
      .select($"id", $"rk".cast("long"), $"n")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("matches the window rank on ties, singletons and negatives") {
    val rows = Seq(
      ("web", 0.5), ("web", 0.5), ("web", 0.1), ("web", 0.9),
      ("web", -3.25), ("wiki", 0.7), ("wiki", 0.7),
      ("code", 0.42)) // singleton group
    crossCheck(rows, bands = 4)    // ties and near values share bands
    crossCheck(rows, bands = 1024) // and when every value is its own band
  }

  test("constant column: width 0 puts every row in band 0, all ranks 1") {
    crossCheck(Seq(("a", 7.0), ("a", 7.0), ("b", 7.0)), bands = 16)
  }

  test("band-boundary ties can never split: dense duplicate mass") {
    // 0.0 .. 0.9 each duplicated — with 8 bands several distinct values
    // share a band and several tie-groups sit exactly on band edges
    val rows = (0 until 10).flatMap(i =>
      Seq(("s", i / 10.0), ("s", i / 10.0), ("t", i / 10.0)))
    crossCheck(rows, bands = 8)
  }

  test("empty input yields null rank columns, no failure") {
    val df = Seq.empty[(Long, String, Double)].toDF("id", "g", "v")
    val out = Ranking.rankByGroup(df, "g", "v")
    assert(out.count() == 0L)
    assert(out.columns.contains("__rk") && out.columns.contains("__n"))
  }

  test("dirty rows (null group, NaN/null/±inf value) pass through with " +
       "null __rk/__n; clean rows rank against clean rows only") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "a", 0.5), Row(2L, "a", 0.1), Row(3L, "a", 0.5),
      Row(4L, "a", Double.NaN),                 // NaN value
      Row(5L, null, 0.3),                       // null group
      Row(6L, "a", null),                       // null value
      Row(7L, "b", Double.PositiveInfinity),    // +inf value
      Row(8L, "b", 2.0)), schema)
    val out = Ranking.rankByGroup(df, "g", "v")
      .select($"id", $"__rk", $"__n")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2L, 3L), (2L, 1L, 3L), (3L, 2L, 3L), // ties are peers, n=3 clean
      (4L, -1L, -1L), (5L, -1L, -1L), (6L, -1L, -1L), (7L, -1L, -1L),
      (8L, 1L, 1L)))                            // b's only clean row
  }

  test("all-dirty input yields null rank columns, no failure") {
    val bad = Seq((1L, "a", Double.NaN)).toDF("id", "g", "v")
    val out = Ranking.rankByGroup(bad, "g", "v").select($"__rk", $"__n").head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
