package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.VectorExpressions

class FunctionsSpec extends SparkSpec {

  test("bloom filter: scalar-subquery probe, zero false negatives, sane fp rate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.BloomFunctions
    val xs = (1L to 500L).toDF("v")
    val bloom = BloomFunctions.scalarOf(
      xs.agg(BloomFunctions.bloomFilterAgg(col("v"), 1000L, 1L << 16).as("bf")))
    val probed = (1L to 600L).toDF("p")
      .select(col("p"), BloomFunctions.mightContain(bloom, col("p")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((1L to 500L).forall(probed(_)), "a Bloom filter can never miss a member")
    assert((501L to 600L).count(probed(_)) <= 5,
      "65536 bits over 500 items should have a negligible fp rate")
  }

  test("cosine_sim is callable from SQL after registration") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("cosine_sim NULL semantics: null input, length mismatch, zero norm") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_sim(CAST(NULL AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>)) AS a,
        |  cosine_sim(CAST(array(1.0) AS ARRAY<FLOAT>), CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS b,
        |  cosine_sim(CAST(array(0.0) AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>)) AS c
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("GraftExtensions installs without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("SpaceSaving: exact in-capacity; heavy hitter guaranteed over capacity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    import graft.functions.SpaceSavingAggregator
    def sketch(df: org.apache.spark.sql.DataFrame, m: Int) = df
      .agg(SpaceSavingAggregator.spaceSaving(m)(col("t")).as("sk"))
      .select(explode(col("sk")).as("it"))
      .select(col("it.token"), col("it.count"), col("it.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // distinct ≤ capacity → exact counts, zero error
    val small = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val exact = sketch(small.toDF("t").repartition(4), m = 8)
    assert(exact.toSet == Set(("a", 30L, 0L), ("b", 20L, 0L), ("c", 10L, 0L)))

    // 300 singletons + one token with 100 occurrences, capacity 16:
    // n = 400, n/m = 25 < 100 → the heavy token MUST survive, its
    // reported count in [true, true + err], err < n/m per partition
    // semantics (overestimates only)
    val heavy = (Seq.fill(100)("HOT") ++ (1 to 300).map("u" + _))
    val sk = sketch(scala.util.Random.shuffle(heavy).toDF("t").repartition(4), m = 16)
    assert(sk.length <= 16)
    val hot = sk.find(_._1 == "HOT")
    assert(hot.isDefined, s"heavy hitter evicted: $sk")
    val (_, c, e) = hot.get
    assert(c >= 100L, "sketch count never underestimates")
    assert(c - e <= 100L, "count minus error lower-bounds the true count")
  }

  test("nearest_centroid_micros equals the HOF spelling, tie-breaks to the lower label") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // vectors with negative components and values engineered near the
    // rounding boundary; model fields via the same positional cast the
    // operator uses
    val modelType = "array<struct<lab:int,cm:array<bigint>>>"
    val model = typedlit(Seq(
      (2, Seq(500000L, -250000L, 0L)),
      (0, Seq(500000L, -250000L, 0L)),   // duplicate centroid: tie → lab 0
      (1, Seq(-1000000L, 750000L, 125L)))).cast(modelType)
    val vecs = Seq(
      (1, Seq(0.5f, -0.25f, 0.0f)),      // exact hit on the duplicate pair
      (2, Seq(-1.0f, 0.75f, 0.000125f)), // exact hit on lab 1
      (3, Seq(0.1234565f, -0.9999995f, 0.31f)),
      (4, Seq(-0.0000005f, 0.0000004f, -0.0000006f))).toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
    val got = vecs.select(col("id"),
        graft.functions.VectorExpressions
          .nearest_centroid_micros(col("v"), model).as("best"))
      .select(col("id"), col("best.d2"), col("best.lab"))
      .orderBy(col("id")).collect().map(r => (r.getLong(1), r.getInt(2)))
    val want = vecs
      .withColumn("__xm",
        expr("transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"))
      .withColumn("__model", model)
      .withColumn("best", array_min(expr(
        """transform(__model, c -> struct(
             aggregate(zip_with(__xm, c.cm, (a, b) -> (a - b) * (a - b)),
                       CAST(0 AS BIGINT), (s, x) -> s + x) AS d2,
             c.lab AS lab))""")))
      .select(col("id"), col("best.d2"), col("best.lab"))
      .orderBy(col("id")).collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(got.toSeq == want.toSeq,
      s"codegen expression diverged from the HOF spelling: ${got.toSeq} vs ${want.toSeq}")
    assert(got(0) == (0L, 0), s"exact-hit tie must break to the lower label: ${got(0)}")
    assert(got(1)._2 == 1)
  }

  test("nearest_cosine_cell equals the HOF fold: ties, zero-norm cells, NULL/seed edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.similarity.Similarity
    val cents: Seq[Array[Double]] = Seq(
      Array(1.0, 0.0, 0.0),
      Array(1.0, 0.0, 0.0),   // duplicate centroid: strict > keeps cell 0
      Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 0.0))   // zero norm: cosine undefined, cell skipped
    val vecs = Seq(
      (1, Seq(Some(1f), Some(0f), Some(0f))),     // tie between cells 0/1
      (2, Seq(Some(0f), Some(2f), Some(0.1f))),   // cell 2
      (3, Seq(Some(-1f), Some(0f), Some(0f))),    // anti-aligned, still cell 2? no — argmax over {-1,-1,0,skip} = 0 at cell 2
      (4, Seq(Some(1f), None, Some(0f))),         // NULL element → seed -1
      (5, Seq(Some(0f), Some(0f), Some(0f))))     // zero vector → seed -1
      .toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
    def run(c: org.apache.spark.sql.Column) = vecs
      .select(col("id"), c.as("cid")).orderBy(col("id"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val fused = run(Similarity.nearestCentroid(col("v"), cents))
    val hof = run(Similarity.nearestCentroidHof(col("v"), cents))
    assert(fused === hof,
      s"fused expression diverged from the HOF fold: $fused vs $hof")
    assert(fused(0)._2 === 0, "exact tie must keep the earlier cell")
    assert(fused(3)._2 === -1 && fused(4)._2 === -1,
      "unscorable vectors take the seed cid -1")
    // empty model → seed -1 on every row, matching the HOF
    assert(run(Similarity.nearestCentroid(col("v"), Seq.empty)) ===
      run(Similarity.nearestCentroidHof(col("v"), Seq.empty)))
  }

  test("nearest_centroid_micros NULL semantics: null vector, empty model, dim mismatch") {
    import org.apache.spark.sql.functions._
    val modelType = "array<struct<lab:int,cm:array<bigint>>>"
    val model = typedlit(Seq((0, Seq(0L, 0L)))).cast(modelType)
    val row = spark.range(1).select(
      graft.functions.VectorExpressions.nearest_centroid_micros(
        lit(null).cast("array<float>"), model).as("a"),
      graft.functions.VectorExpressions.nearest_centroid_micros(
        expr("CAST(array(0.1, 0.2) AS ARRAY<FLOAT>)"),
        array().cast(modelType)).as("b"),
      graft.functions.VectorExpressions.nearest_centroid_micros(
        expr("CAST(array(0.1, 0.2, 0.3) AS ARRAY<FLOAT>)"), model).as("c"))
      .collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2),
      s"null vector / empty model / dim mismatch must all yield NULL: $row")
  }

  test("CountMin: exact when collision-free, never underestimates when saturated, merge lossless") {
    import spark.implicits._
    import graft.functions.CountMinSketch
    import org.apache.spark.sql.functions._
    // skewed stream: token t_i occurs i times, 40 distinct tokens
    val items = (1 to 40).flatMap(i => Seq.fill(i)(s"t$i"))
    val df = items.toDF("item")
    def sketchOf(d: org.apache.spark.sql.DataFrame, depth: Int, width: Int): Seq[Long] =
      d.agg(CountMinSketch.countMin(depth, width)(
          CountMinSketch.positions(col("item"), depth, width)).as("sk"))
        .collect()(0).getSeq[Long](0)
    def estimates(sk: Seq[Long], depth: Int, width: Int): Map[String, Long] =
      (1 to 40).map(i => s"t$i").toDF("item")
        .select(col("item"),
          CountMinSketch.estimate(typedLit(sk), col("item"), depth, width).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // roomy sketch: estimates are exactly the true counts
    val roomy = estimates(sketchOf(df, 4, 1024), 4, 1024)
    assert((1 to 40).forall(i => roomy(s"t$i") == i.toLong), s"collision-free regime must be exact: $roomy")
    // saturated sketch (width 8 << 40 distinct): collisions everywhere,
    // but min-of-rows still never undershoots the true count
    val tight = estimates(sketchOf(df, 3, 8), 3, 8)
    assert((1 to 40).forall(i => tight(s"t$i") >= i.toLong), s"CMS must never underestimate: $tight")
    // merge of per-partition partials == the one-pass sketch, elementwise
    assert(sketchOf(df.repartition(8), 4, 64) == sketchOf(df.coalesce(1), 4, 64),
      "partial-merge must equal the single-pass sketch")
  }
}
