package graft

/** Pins the measured-recall contracts that back the approximate-index
  * oracles at BOTH gate scale factors — the correctness sf (0.01) and
  * the bench sf (SPARK_GRAFT_SF_DIR, default 0.1) — the same dual-sf
  * discipline as TextDedupSpec's minhash/simhash pins. The oracles
  * assert `recall_ok`/`subset_ok` TRUE; these specs run the exact
  * registered queries against the driver corpora so a testdata refresh
  * that hollows a bound fails HERE, loudly, instead of surfacing as an
  * opaque gate hash mismatch.
  */
class RecallPinSpec extends SparkSpec {

  private val dirs = Seq("/root/testdata/sf0.01",
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).distinct
    .filter(d => java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$d/embeddings.parquet")))

  test("embedding-LSH near-dup oracle precondition: subset + recall >= 0.9 at both gate sfs") {
    assume(dirs.nonEmpty, "driver testdata not present")
    dirs.foreach { d =>
      val row = queries.DedupQueries.qDedupEmbeddingLsh.run(spark, d).collect()(0)
      assert(row.getAs[Long]("n_exact") > 0,
        s"$d: fixture must contain cosine>=0.35 pairs or the pin is vacuous")
      assert(row.getAs[Boolean]("subset_ok"),
        s"$d: LSH emitted a pair outside the exact graph — verify step broken")
      assert(row.getAs[Boolean]("recall_ok"),
        s"$d: 32x4 hyperplane LSH recall fell below the 0.9 oracle bound")
    }
  }

  test("SemDeDup oracle precondition: subset + recall >= 0.9 at both gate sfs") {
    assume(dirs.nonEmpty, "driver testdata not present")
    dirs.foreach { d =>
      val row = queries.DedupQueries.qDedupSemantic.run(spark, d).collect()(0)
      assert(row.getAs[Long]("n_exact") > 0,
        s"$d: fixture must contain cosine>=0.35 pairs or the pin is vacuous")
      assert(row.getAs[Boolean]("subset_ok"),
        s"$d: semantic tier emitted a pair outside the exact graph — verify step broken")
      assert(row.getAs[Boolean]("recall_ok"),
        s"$d: 8-cell x 3-probe k-means recall fell below the 0.9 oracle bound")
    }
  }

  test("random-projection-ANN oracle precondition: mean recall@10 >= 0.5 at both gate sfs") {
    assume(dirs.nonEmpty, "driver testdata not present")
    dirs.foreach { d =>
      val row = queries.SimilarityQueries.qAnnRandomProjection.run(spark, d).collect()(0)
      assert(row.getAs[Long]("n_probes") > 0,
        s"$d: probe set empty — the recall contract checks nothing")
      assert(row.getAs[Boolean]("recall_ok"),
        s"$d: JL-projection + 200-rerank recall fell below the 0.5 oracle bound")
    }
  }

  test("quantized-ANN oracle precondition: mean recall@10 >= 0.8 at both gate sfs") {
    assume(dirs.nonEmpty, "driver testdata not present")
    dirs.foreach { d =>
      val row = queries.SimilarityQueries.qAnnQuantized.run(spark, d).collect()(0)
      assert(row.getAs[Long]("n_probes") > 0,
        s"$d: probe set empty — the recall contract checks nothing")
      assert(row.getAs[Boolean]("recall_ok"),
        s"$d: int8-quantized search recall fell below the 0.8 oracle bound")
    }
  }

  test("PQ-ANN oracle precondition: mean recall@10 >= 0.9 at both gate sfs") {
    assume(dirs.nonEmpty, "driver testdata not present")
    dirs.foreach { d =>
      val row = queries.SimilarityQueries.qAnnPq.run(spark, d).collect()(0)
      assert(row.getAs[Long]("n_probes") > 0,
        s"$d: probe set empty — the recall contract checks nothing")
      assert(row.getAs[Boolean]("recall_ok"),
        s"$d: PQ m=16 kw=32 + 150-rerank recall fell below the 0.9 oracle bound")
    }
  }

  test("IVFPQ oracle precondition: mean recall@10 >= 0.5 at both gate sfs") {
    assume(dirs.nonEmpty, "driver testdata not present")
    dirs.foreach { d =>
      val row = queries.SimilarityQueries.qAnnIvfPq.run(spark, d).collect()(0)
      assert(row.getAs[Long]("n_probes") > 0,
        s"$d: probe set empty — the recall contract checks nothing")
      assert(row.getAs[Boolean]("recall_ok"),
        s"$d: IVFPQ 16-cell/6-probe recall fell below the 0.5 oracle bound")
    }
  }
}
