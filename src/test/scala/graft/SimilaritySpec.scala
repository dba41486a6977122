package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f), 0),
    (2L, Array(0f, 1f, 0f), 1),
    (3L, Array(0f, 0f, 1f), 2),
    (4L, Array(-1f, 0f, 0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val out = spark.range(1).select(
      Similarity.cosine(lit(Array(1.0f, 2.0f)), lit(Array(1.0f, 2.0f))).as("same"),
      Similarity.cosine(lit(Array(1.0f, 0.0f)), lit(Array(0.0f, 3.0f))).as("orth"),
      Similarity.cosine(lit(Array(1.0f, 0.0f)), lit(Array(-2.0f, 0.0f))).as("opp"))
      .collect()(0)
    assert(math.abs(out.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(out.getDouble(1)) < 1e-12)
    assert(math.abs(out.getDouble(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine, excludes self") {
    val probes = vecs.filter($"vec_id" === 0L)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", probes, 4)
      .orderBy($"rank").collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(top.head.getAs[Double]("score") > 0.99)
    assert(top.last.getAs[Double]("score") == -1.0)
  }

  test("topK rank step is an aggregation, not a per-probe window sort") {
    val probes = vecs.filter($"vec_id" === 0L)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val plan = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", probes, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "rank must not materialize a window sort")
    assert(plan.contains("Aggregate"), "rank must be a (partial-merge) aggregation")
  }

  test("centroids computes per-label means, dims in order") {
    val c = Similarity.centroids(vecs, "label", "embedding")
      .collect().map(r => r.getAs[Int]("label") -> r.getSeq[Double](1)).toMap
    assert(c(1) == Seq(0.0, 1.0, 0.0))
    assert(math.abs(c(0)(0) - (1.0 + 0.9 - 1.0) / 3) < 1e-7)
  }

  // Deterministic clustered corpus for the recall sweep: 4 orthogonal
  // cluster centres in 8 dims, 120 vectors (i -> cluster i % 4) with a
  // small arithmetic perturbation — no RNG, so recall numbers are
  // stable across runs and JVMs.
  private def clustered = {
    val rows = (0 until 120).map { i =>
      val c = i % 4
      val v = Array.tabulate(8) { j =>
        val base = if (j == 2 * c || j == 2 * c + 1) 1.0f else 0.0f
        base + ((i * 31 + j * 17) % 11 - 5) * 0.03f
      }
      (i.toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  private def probesOf(df: org.apache.spark.sql.DataFrame) =
    df.filter($"vec_id" % 15 === 0)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))

  test("recall sweep: every ANN path clears its recall contract on a clustered corpus") {
    val vecs = clustered
    val probes = probesOf(vecs)
    val k = 5
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", probes, k)

    def check(ann: org.apache.spark.sql.DataFrame, bound: Double, what: String): Unit = {
      val row = Similarity.recallAtK(ann, exact, k, bound).collect()(0)
      assert(row.getAs[Long]("n_probes") == 8L, s"$what: probe count")
      assert(row.getAs[Boolean]("recall_ok"), s"$what: mean recall below $bound")
    }
    check(Similarity.lshTopK(vecs, "vec_id", "embedding", probes, k,
      tables = 16, bits = 6), 0.4, "hyperplane LSH (16 tables x 6 bits)")
    check(Similarity.ivfTopK(vecs, "vec_id", "embedding", "label", probes, k,
      nProbe = 2), 0.8, "label-partition IVF (nProbe 2)")
    check(Similarity.kmeansIvfTopK(vecs, "vec_id", "embedding", probes, k,
      kClusters = 4, iters = 3, nProbe = 2), 0.8, "k-means IVF (4 cells, nProbe 2)")
    // quantization perturbs each element by <= 0.5/127 — ranking should
    // be nearly unchanged, so the bound is far above the ANN paths'
    check(Similarity.quantizedTopK(vecs, "vec_id", "embedding", probes, k),
      0.9, "int8-quantized brute force")
  }

  test("recallAtK counts missed probes as zero hits") {
    val vecs = clustered
    val probes = probesOf(vecs)
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", probes, 3)
    // an "ANN" that only ever returns results for one probe
    val partial = exact.filter($"probe_id" === 0L)
    val row = Similarity.recallAtK(partial, exact, 3, 0.99).collect()(0)
    assert(row.getAs[Long]("n_probes") == 8L, "missed probes stay in the denominator")
    assert(!row.getAs[Boolean]("recall_ok"))
  }

  test("ivfTopK searches only the probed partitions") {
    val probes = vecs.filter($"vec_id" === 0L)
      .select($"vec_id".as("probe_id"), $"embedding".as("probe_vec"))
    val hits = Similarity.ivfTopK(vecs, "vec_id", "embedding", "label", probes, 10, nProbe = 1)
      .collect()
    // nProbe=1 -> only label 0's partition is searched
    assert(hits.map(_.getAs[Int]("from_partition")).toSet == Set(0))
    assert(hits.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L, 4L))
  }

  test("int8Quantize: max element hits ±127, error bounded by scale/2, zero vector safe") {
    val e = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),  // amax 1.0 -> scale 1/127
      (2L, Array(0.0f, 0.0f, 0.0f))     // zero vector -> guard scale, all q = 0
    ).toDF("vec_id", "embedding")
    val rows = e.select(col("vec_id"),
      Similarity.int8Quantize(col("embedding")).as("z"))
      .select(col("vec_id"), col("z.scale"), col("z.q")).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    val scale = r1.getDouble(1)
    val q = r1.getSeq[Double](2)
    assert(q(1) == -127.0, "the max-magnitude element must quantize to -127")
    val orig = Seq(0.5, -1.0, 0.25)
    orig.zip(q).foreach { case (v, qi) =>
      assert(math.abs(v - qi * scale) <= scale / 2 + 1e-9,
        s"reconstruction error exceeds scale/2 for $v") }
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getSeq[Double](2).forall(_ == 0.0), "zero vector quantizes to zeros")
  }

  test("labelCentroidComponents equals the per-(label, dim) arithmetic mean") {
    val e = Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(5.0f, -6.5f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroidComponents(e, "label", "embedding")
      .collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("dim"))
        -> (r.getAs[Long]("n"), r.getAs[Double]("centroid"))).toMap
    assert(got((0, 0)) == (2L, 2.0))  // (1+3)/2
    assert(got((0, 1)) == (2L, 3.0))  // (2+4)/2
    assert(got((1, 0)) == (1L, 5.0))
    assert(got((1, 1)) == (1L, -6.5))
  }

  test("signMatrix: deterministic, ±1-valued, roughly balanced") {
    val a = Similarity.signMatrix(64, 32, 42L)
    val b = Similarity.signMatrix(64, 32, 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "same seed must rebuild the same matrix")
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
    val pos = a.flatten.count(_ == 1.0)
    assert(pos > 64 * 32 / 4 && pos < 64 * 32 * 3 / 4,
      s"sign balance degenerate: $pos of ${64 * 32} positive")
    assert(Similarity.signMatrix(64, 32, 43L).map(_.toSeq).toSeq != a.map(_.toSeq).toSeq,
      "different seed must change the matrix")
  }

  test("randomProject: exact signed sums, null-in null-out") {
    val m = Similarity.signMatrix(3, 2, 7L)
    val df = Seq(Tuple1(Array(1f, 2f, 3f)), Tuple1(null.asInstanceOf[Array[Float]]))
      .toDF("v")
      .select(Similarity.randomProject(col("v"), 3, 2, 7L).as("p"))
    val rows = df.collect()
    val got = rows(0).getAs[scala.collection.Seq[Float]]("p")
    val want = m.map(row => (row(0) * 1 + row(1) * 2 + row(2) * 3).toFloat).toSeq
    assert(got.toSeq == want, s"projection must equal the literal signed sum: $got vs $want")
    assert(rows(1).isNullAt(0), "null vector must project to null, not an array of nulls")
  }

  test("randomProjectionTopK: self-excluded, k rows per probe, rerank scores are exact cosine") {
    val p = vecs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val got = Similarity.randomProjectionTopK(vecs, "vec_id", "embedding", p, 2,
      inDim = 3, projDim = 2, overfetch = 4).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("score"))).toSeq
    assert(got.size == 2)
    assert(!got.map(_._1).contains(0L), "probe must not retrieve itself")
    // overfetch covers the whole corpus here, so the rerank must equal
    // exact brute force: nearest is vec 1 (cos≈0.993), then 2 or 3 (0)
    assert(got.head._1 == 1L && math.abs(got.head._2 - 0.993884) < 1e-6,
      s"rerank must surface the exact-cosine nearest neighbor: $got")
  }

  test("pqFit is deterministic; pqEncode codes are in [0, kw) with one code per subspace") {
    val larger = spark.range(0, 60).selectExpr("id AS vec_id",
      "transform(sequence(0, 5), d -> CAST(pmod(id * 37 + d * 11, 23) / 23.0 - 0.5 AS FLOAT)) AS embedding")
    val fit1 = Similarity.pqFit(larger, "vec_id", "embedding", m = 2, kw = 4)
    val fit2 = Similarity.pqFit(larger, "vec_id", "embedding", m = 2, kw = 4)
    assert(fit1.size == 2 && fit1.forall(_.size == 4))
    fit1.zip(fit2).foreach { case (b1, b2) =>
      b1.zip(b2).foreach { case (v1, v2) =>
        assert(v1.sameElements(v2), "same data + seeds must refit identically")
      }
    }
    val codes = Similarity.pqEncode(larger, "vec_id", "embedding", fit1)
      .select(col("__codes")).collect()
      .map(_.getAs[scala.collection.Seq[Int]](0))
    assert(codes.length == 60)
    assert(codes.forall(c => c.size == 2 && c.forall(x => x >= 0 && x < 4)))
  }

  test("pqTopK without rerank still self-ranks a duplicated vector pair together") {
    // two identical vectors must share codes, hence identical ADC
    // scores against any probe — the compression cannot split them
    val dup = spark.range(0, 40).selectExpr("id AS vec_id",
      """transform(sequence(0, 5),
         d -> CAST(pmod((id div 2) * 53 + d * 19, 31) / 31.0 - 0.5 AS FLOAT)) AS embedding""")
    val books = Similarity.pqFit(dup, "vec_id", "embedding", m = 2, kw = 8)
    val enc = Similarity.pqEncode(dup, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]](1).toSeq).toMap
    (0 until 40 by 2).foreach { i =>
      assert(enc(i.toLong) == enc(i.toLong + 1),
        s"identical vectors $i/${i + 1} must encode identically")
    }
  }
}
