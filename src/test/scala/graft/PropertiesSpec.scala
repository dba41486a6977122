package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{DateDim, IncrementalOps, KeyOps}

/** Property-based laws (SURVEY §5.3): idempotency, except-laws,
  * surrogate-key density, date-key bijectivity. Plain ScalaCheck
  * generators sampled with fixed seeds (the scalatest bridge artifact
  * is not on the offline classpath).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 10), Gen.oneOf("a", "b", "c")))

  test("law: exceptNew(batch, loaded ∪ batch) is empty (idempotent replay)") {
    samples(Gen.zip(rowsGen, rowsGen), 8).foreach { case (batch, loaded) =>
      val b = batch.toDF("id", "v")
      val l = loaded.toDF("id", "v")
      assert(IncrementalOps.exceptNew(b, l.union(b)).isEmpty)
    }
  }

  test("law: exceptNew result is disjoint from loaded and subset of batch") {
    samples(Gen.zip(rowsGen, rowsGen), 8).foreach { case (batch, loaded) =>
      val b = batch.toDF("id", "v")
      val l = loaded.toDF("id", "v")
      val delta = IncrementalOps.exceptNew(b, l)
      assert(delta.intersect(l).isEmpty)                  // disjoint from loaded
      assert(delta.exceptAll(b.dropDuplicates()).isEmpty) // ⊆ distinct(batch)
    }
  }

  test("law: surrogate keys are dense, unique, 1..n") {
    samples(Gen.listOfN(25, Gen.alphaStr.suchThat(_.nonEmpty)), 8).foreach { names =>
      val distinct = names.distinct
      val ids = KeyOps.surrogateKey(distinct.toDF("name"), "id", "name")
        .select("id").collect().map(_.getInt(0)).sorted
      assert(ids.toSeq == (1 to distinct.size))
    }
  }

  test("law: bucketHash lands in [0, buckets) and is stable under re-evaluation") {
    import org.apache.spark.sql.functions.col
    samples(Gen.listOfN(50, Gen.choose(0L, Long.MaxValue / 2)), 6).foreach { ids =>
      val df = ids.toDF("id")
      Seq(7L, 1000L, 1000000L).foreach { b =>
        val hs = df.select(graft.text.Curation.bucketHash(col("id"), b).as("h"))
          .collect().map(_.getLong(0))
        assert(hs.forall(h => h >= 0 && h < b), s"bucket out of range for b=$b")
      }
      // determinism across evaluations and partitionings
      val once = df.select(col("id"), graft.text.Curation.bucketHash(col("id"), 1000).as("h"))
      val again = df.repartition(7)
        .select(col("id"), graft.text.Curation.bucketHash(col("id"), 1000).as("h"))
      assert(once.except(again).isEmpty && again.except(once).isEmpty)
    }
  }

  test("law: splitAssign cut points partition the bucket space exactly") {
    import org.apache.spark.sql.functions.col
    samples(Gen.listOfN(60, Gen.choose(0L, Long.MaxValue / 2)), 4).foreach { ids =>
      val df = ids.toDF("id")
      val withBoth = df.select(
        graft.text.Curation.bucketHash(col("id"), 1000).as("h"),
        graft.text.Curation.splitAssign(col("id"), 900, 50).as("s"))
        .collect()
      withBoth.foreach { r =>
        val (h, s) = (r.getLong(0), r.getString(1))
        val expected = if (h < 900) "train" else if (h < 950) "val" else "test"
        assert(s == expected, s"h=$h got $s")
      }
    }
  }

  test("law: scd2Merge invariants hold on generated snapshots") {
    import org.apache.spark.sql.functions._
    val stateGen = Gen.zip(
      Gen.listOfN(25, Gen.zip(Gen.choose(1, 12), Gen.oneOf("A", "B", "C"))),
      Gen.listOfN(12, Gen.zip(Gen.choose(1, 15), Gen.oneOf("A", "B", "C", "X"))))
    samples(stateGen, 6).foreach { case (curPairs, snapPairs) =>
      val current = curPairs.distinctBy(_._1).toDF("id", "seg")
        .select(col("id"), col("seg"),
          to_date(lit("2023-01-01")).as("valid_from"),
          lit(null).cast("date").as("valid_to"))
      val snapshot = snapPairs.distinctBy(_._1).toDF("id", "seg")
      val out = graft.ops.ScdOps.scd2Merge(current, snapshot, "id", Seq("seg"), "2024-06-01")
      // (1) exactly one OPEN row per key that exists anywhere
      val openPerKey = out.filter(col("valid_to").isNull)
        .groupBy(col("id")).count().collect()
      assert(openPerKey.forall(_.getLong(1) == 1L), "one open row per key")
      val allKeys = (curPairs.map(_._1) ++ snapPairs.map(_._1)).distinct.toSet
      assert(openPerKey.map(_.getInt(0)).toSet == allKeys, "every key stays represented")
      // (2) the open row for a snapshot key carries the snapshot value
      val openVals = out.filter(col("valid_to").isNull)
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      snapPairs.distinctBy(_._1).foreach { case (k, v) =>
        assert(openVals(k) == v, s"open row of $k must match snapshot") }
      // (3) closed rows end exactly at the effective date
      out.filter(col("valid_to").isNotNull).collect().foreach { r =>
        assert(String.valueOf(r.getDate(3)) == "2024-06-01") }
    }
  }

  test("law: DetMath.ratio6 equals true BigDecimal HALF_UP rounding of num/den") {
    import org.apache.spark.sql.functions.col
    // the contract double-rounding fails: the quotient's shortest double
    // repr can end in ...5 while its binary value sits below the half,
    // making engines disagree; ratio6 must match exact decimal HALF_UP
    val gen = Gen.zip(Gen.choose(0L, 2000000L), Gen.choose(1L, 5000L))
    samples(Gen.listOfN(300, gen), 4).foreach { pairs =>
      val got = pairs.toDF("num", "den")
        .select(col("num"), col("den"),
          graft.functions.DetMath.ratio6(col("num"), col("den")).as("r"))
        .collect()
      got.foreach { r =>
        val (num, den) = (r.getLong(0), r.getLong(1))
        val expected = (BigDecimal(num) / BigDecimal(den))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(2) == expected, s"ratio6($num, $den)")
      }
    }
  }

  test("law: date key bijectivity (y,m,d) <-> y*10000+m*100+d over generated calendars") {
    samples(Gen.zip(Gen.choose(1995, 2030), Gen.choose(1, 12)), 6).foreach { case (y, m) =>
      val dim = DateDim.dateDimension(spark, f"$y%04d-$m%02d-01", f"$y%04d-$m%02d-28")
      val rows = dim.select("date_dim_id", "year", "month", "day").collect()
      rows.foreach { r =>
        assert(r.getInt(0) ==
          r.getShort(1) * 10000 + r.getByte(2) * 100 + r.getByte(3))
      }
      assert(rows.length == 28)
    }
  }

  test("law: upsert is idempotent and key-complete on generated relations") {
    val rel: Gen[List[(Int, String)]] =
      Gen.listOfN(15, Gen.zip(Gen.choose(0, 12), Gen.oneOf("x", "y", "z")))
    samples(Gen.zip(rel, rel), 6).foreach { case (t0, u0) =>
      val target = t0.toMap.toSeq.toDF("k", "v")        // key-unique both sides
      val updates = u0.toMap.toSeq.toDF("k", "v")
      val once = IncrementalOps.upsert(target, updates, Seq("k"))
      val twice = IncrementalOps.upsert(once, updates, Seq("k"))
      assert(IncrementalOps.sameContent(once, twice))   // idempotent
      val keys = once.select("k").collect().map(_.getInt(0)).toSet
      assert(keys == (t0.map(_._1) ++ u0.map(_._1)).toSet) // union of key sets
      // every update row is present verbatim in the result
      val u = updates.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      once.collect().foreach { r =>
        u.get(r.getInt(0)).foreach(v => assert(r.getString(1) == v))
      }
    }
  }

  test("law: applyDiff(current, snapshotDiff(current, snap)) reconstructs snap") {
    // the round-trip that makes the diff a usable change feed: a
    // replica applying diffs alone stays exactly in sync — over
    // generated key-unique relations with nullable attributes
    val rel: Gen[List[(Int, Option[String])]] =
      Gen.listOfN(15, Gen.zip(Gen.choose(0, 12),
        Gen.option(Gen.oneOf("x", "y", "z"))))
    samples(Gen.zip(rel, rel), 6).foreach { case (c0, s0) =>
      val cur = c0.toMap.toSeq.toDF("k", "v")           // key-unique both sides
      val snap = s0.toMap.toSeq.toDF("k", "v")
      val diff = IncrementalOps.snapshotDiff(cur, snap, Seq("k"))
      val rebuilt = IncrementalOps.applyDiff(cur, diff, Seq("k"))
      assert(IncrementalOps.sameContent(rebuilt, snap),
        s"round-trip failed for cur=${c0.toMap} snap=${s0.toMap}")
    }
  }

  test("law: kthSmallestByGroup agrees with the global kthSmallest per group") {
    import graft.ops.Selection
    import org.apache.spark.sql.functions.col
    val rel: Gen[List[(String, Int)]] = Gen.listOfN(60,
      Gen.zip(Gen.oneOf("g1", "g2"), Gen.choose(-1000, 1000)))
    samples(rel, 4).foreach { rows =>
      val df = rows.toDF("g", "v")
      val byGroup = Selection.kthSmallestByGroup(df, "g", col("v"),
        n => (n + 1) / 2, buckets = 8, collectThreshold = 4)
      rows.groupBy(_._1).foreach { case (g, vs) =>
        val global = Selection.kthSmallest(
          df.filter(col("g") === g), col("v"), (vs.length + 1) / 2,
          buckets = 8, collectThreshold = 4)
        assert(byGroup(g) == global, s"group $g")
      }
    }
  }

  private val histGen: Gen[Map[Long, Long]] =
    Gen.mapOfN(6, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 1000L)))
      .map(_.filter(_._2 > 0))

  test("law: tvdMicros is a pseudometric — identity, symmetry, [0, 1e6] bounds, zero-key invariance") {
    import graft.streaming.EventsStreaming.tvdMicros
    samples(Gen.zip(histGen, histGen), 60).foreach { case (a, b) =>
      assert(tvdMicros(a, a) == 0L, s"identity: $a")
      assert(tvdMicros(a, b) == tvdMicros(b, a), s"symmetry: $a $b")
      val t = tvdMicros(a, b)
      // each share rounds half-away to micros, so the sum can sit up
      // to 0.5 micro per key off the exact value — the bound carries
      // that slack, it is not a defect in the statistic
      val slack = (a.size + b.size + 1) / 2 + 1
      assert(t >= 0L && t <= 1000000L + slack, s"bounds: $t")
      // a key present with count 0 is the same as absent
      assert(tvdMicros(a + (99L -> 0L), b) == t, s"zero-key: $a $b")
      // disjoint non-empty histograms are at maximal distance (up to
      // the same rounding slack and the documented floor in the /2)
      if (a.nonEmpty && b.nonEmpty) {
        val bShift = b.map { case (k, v) => (k + 100L) -> v }
        assert(tvdMicros(a, bShift) >= 1000000L - slack, "disjoint support ~ 1.0")
      }
    }
  }

  private val pqModelGen: Gen[Seq[Seq[Array[Double]]]] = {
    val vecGen = Gen.listOfN(4, Gen.choose(-1e6, 1e6)).map(_.toArray)
    Gen.listOfN(3, Gen.listOfN(5, vecGen).map(_.toSeq)).map(_.toSeq)
  }

  test("law: PQ model save/load round-trips exactly (doubles are bit-preserved)") {
    import graft.similarity.Similarity
    samples(pqModelGen, 5).zipWithIndex.foreach { case (books, i) =>
      val path = tmpDir(s"pq-model-$i")
      Similarity.savePqModel(spark, path, books)
      val back = Similarity.loadPqModel(spark, path)
      assert(back.size == books.size)
      books.zip(back).foreach { case (b0, b1) =>
        assert(b0.size == b1.size)
        b0.zip(b1).foreach { case (v0, v1) => assert(v0.sameElements(v1)) }
      }
    }
  }
}
