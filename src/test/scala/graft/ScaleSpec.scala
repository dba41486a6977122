package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewOps

/** Scale-posture mechanics: salting equivalence and bucketed co-located
  * joins (the no-shuffle join layout for repeated big⋈big joins).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join") {
    val big = (1 to 10000).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (30L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select($"k", $"v", $"name")
    val salted = SkewOps.saltedJoin(big, small, "k", salts = 8)
      .select($"k", $"v", $"name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin preserves left-outer semantics and rejects right/full outer") {
    val big = (1 to 1000).map(i => (if (i % 5 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (3L, "a")).toDF("k", "name")
    val plain = big.join(small, Seq("k"), "left").select($"k", $"v", $"name")
    val salted = SkewOps.saltedJoin(big, small, "k", salts = 8, joinType = "left")
      .select($"k", $"v", $"name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // unmatched small-side rows would be emitted once per salt replica
    assertThrows[IllegalArgumentException] {
      SkewOps.saltedJoin(big, small, "k", 8, joinType = "full_outer")
    }
    assertThrows[IllegalArgumentException] {
      SkewOps.saltedJoin(big, small, "k", 8, joinType = "right")
    }
  }

  /** The other half of the skew story: [[SkewOps.saltedJoin]] is the
    * planned-ahead mitigation, AQE's OptimizeSkewedJoin the runtime
    * one — this pins that the runtime half actually engages. One hot
    * key carries a fat payload (~12 MB in one shuffle partition against
    * a tiny median), thresholds are lowered to test scale, broadcast
    * demotion is disabled so the sort-merge join survives to runtime,
    * and the executed adaptive plan must carry the skew=true marker
    * with the join's row set unchanged.
    */
  test("AQE splits a skewed sort-merge partition at runtime") {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "100KB")
      spark.conf.set(keys(1), "50KB")
      spark.conf.set(keys(2), "2")
      spark.conf.set(keys(3), "-1")
      val big = spark.range(300000)
        .select(lit(0L).as("key"), rpad(col("id").cast("string"), 36, "p").as("payload"))
        .union(spark.range(5000)
          .select((col("id") % 50 + 1).as("key"), lit("small").as("payload")))
      val dim = spark.range(51).select(col("id").as("key"), lit("d").as("dv"))
      // the payload must SURVIVE into the join output: a key-only
      // projection lets column pruning strip it before the exchange and
      // the hot partition compresses below the skew threshold. collect()
      // (not count()/foreach(), which run different QueryExecutions)
      // finalizes j's OWN AdaptiveSparkPlanExec; ~14 MB on the driver.
      val j = big.join(dim.hint("merge"), Seq("key"))
      val n = j.collect().length
      assert(n == 305000, s"join row set must be unchanged by skew splitting: $n")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"final adaptive plan must mark the skewed join:\n${plan.take(1200)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("repeatedSpans and scrub are partitioning-invariant") {
    import graft.dedup.Dedup
    val docs = (1 to 60).map { i =>
      val boiler = "all rights reserved by the acme corporation of delaware"
      (i.toLong, if (i % 4 == 0) s"$boiler unique tail $i" else s"original body $i with words $i")
    }.toDF("doc_id", "text")
    def spans(parts: Int) = Dedup
      .repeatedSpans(docs.repartition(parts), "doc_id", "text", gramLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans(1) == spans(13))
    def clean(parts: Int) = Dedup
      .scrubRepeatedSpans(docs.repartition(parts), "doc_id", "text",
        gramLen = 4, minSpanTokens = 8L)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(clean(1) == clean(13))
  }

  test("saltedSum equals plain aggregation") {
    val df = (1 to 5000).map(i => (if (i % 3 == 0) "hot" else s"k$i", i.toLong)).toDF("k", "v")
    val plain = df.groupBy($"k").agg(sum($"v").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedSum(df, "k", "v", 8, "s").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("maxDf cap keeps a boilerplate-heavy corpus's pair graph linear") {
    // 200 docs = one shared 20-token boilerplate + a unique tail token.
    // Uncapped, the ubiquitous shingles put every doc pair above tau:
    // C(200,2) = 19900 edges — the quadratic blowup ClusterMaxDf exists
    // to prevent. With the cap below 200, boilerplate shingles are
    // dropped before the join and only the unique-tail shingles remain,
    // which no two docs share: zero pairs, join input linear in n.
    val boiler = "merge join table scan filter group sort window " +
      "hash batch row column key value query spark fast slow big"
    val docs = (0L until 200L)
      .map(i => (i, s"$boiler tail$i")).toDF("doc_id", "text")
    val uncapped = graft.dedup.Dedup.jaccardPairsExact(
      docs, "doc_id", "text", k = 3, tau = 0.3, probePred = _ => lit(true))
    assert(uncapped.count() == 19900L, "uncapped boilerplate corpus is all-pairs")
    val capped = graft.dedup.Dedup.jaccardPairsExact(
      docs, "doc_id", "text", k = 3, tau = 0.3, probePred = _ => lit(true),
      maxDf = Some(50L))
    assert(capped.isEmpty, "df cap must drop the corpus-ubiquitous shingles")
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val adaptiveBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val bcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false") // static plan for the assert
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path

      (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("graft_bucket_l")
      (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
        .write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("graft_bucket_r")

      val joined = spark.table("graft_bucket_l")
        .join(spark.table("graft_bucket_r"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", adaptiveBefore)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcastBefore)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
    }
  }
}
