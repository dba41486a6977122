package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TemporalOps

/** The native as-of join operator (graft.plans.AsOfJoinPlan /
  * AsOfJoinExec, injected via GraftExtensions) against the declarative
  * union+carry-forward spelling it replaces at scale — differential
  * equivalence over the edge cases (NULL keys, NULL timestamps on both
  * sides, tie timestamps, keys with no match, forward direction), plus
  * the plan-shape contract: the custom exec node is planned, each side
  * is exchanged once on its own key, and both sides are sorted by
  * (key, ts) under it.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private lazy val left = Seq(
    (1L, java.lang.Long.valueOf(10L), ts(100)),
    (2L, java.lang.Long.valueOf(10L), ts(50)),
    (3L, java.lang.Long.valueOf(10L), ts(5)),    // before every right row
    (4L, java.lang.Long.valueOf(20L), ts(100)),  // key with no right rows
    (5L, java.lang.Long.valueOf(30L), ts(100)),  // exact-tie timestamp
    (6L, null.asInstanceOf[java.lang.Long], ts(100)), // NULL key
    (7L, java.lang.Long.valueOf(10L), null.asInstanceOf[Timestamp]) // NULL ts
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    (java.lang.Long.valueOf(10L), ts(10), "a"),
    (java.lang.Long.valueOf(10L), ts(60), "b"),
    (java.lang.Long.valueOf(10L), ts(100), "c"),
    (java.lang.Long.valueOf(30L), ts(100), "tie"),
    (java.lang.Long.valueOf(30L), ts(200), "later"),
    (null.asInstanceOf[java.lang.Long], ts(10), "nullkey"),
    (java.lang.Long.valueOf(10L), null.asInstanceOf[Timestamp], "nullts")
  ).toDF("k", "t", "payload")

  private def canon(df: DataFrame): Seq[(Long, Option[Long], Option[String])] =
    df.select(col("id"), unix_micros(col("asof_ts")).as("mt"), col("asof_payload"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        Option(r.getString(2)))).sortBy(_._1).toSeq

  test("backward: native merge equals the declarative carry-forward on every edge case") {
    val native = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "t",
      Seq("payload"))
    val decl = TemporalOps.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("payload"))
    assert(canon(native) === canon(decl))
    // and the expected values, spelled out (ties match, null key/ts do not)
    assert(canon(native) === Seq(
      (1L, Some(100000000L), Some("c")),
      (2L, Some(10000000L), Some("a")),
      (3L, None, None),
      (4L, None, None),
      (5L, Some(100000000L), Some("tie")),
      (6L, None, None),
      (7L, None, None)))
  }

  test("forward: native merge equals the declarative spelling") {
    val native = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "t",
      Seq("payload"), forward = true)
    val decl = TemporalOps.asofJoinForward(left, right, Seq("k"), "t", "t",
      Seq("payload"))
    assert(canon(native) === canon(decl))
    assert(canon(native) === Seq(
      (1L, Some(100000000L), Some("c")),   // tie matches forward too
      (2L, Some(60000000L), Some("b")),
      (3L, Some(10000000L), Some("a")),
      (4L, None, None),
      (5L, Some(100000000L), Some("tie")),
      (6L, None, None),
      (7L, None, None)))
  }

  test("plan shape: AsOfJoinExec with one exchange and one sort per side") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "t",
        Seq("payload")).queryExecution.executedPlan
      val execs = plan.collect { case e: graft.plans.AsOfJoinExec => e }
      assert(execs.size === 1, s"expected the native exec node:\n$plan")
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size === 2,
        s"each side shuffles exactly once on its own key:\n$plan")
      val sorts = plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sorts.size === 2, s"each side sorted by (key, ts):\n$plan")
      // the sides are NEVER unioned: no window exec anywhere
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"native path must not fall back to the window plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("broadcast variant: equals the merge variant on every edge case, both directions") {
    for (fwd <- Seq(false, true)) {
      val bcast = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "t",
        Seq("payload"), forward = fwd, broadcastRight = true)
      val merge = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "t",
        Seq("payload"), forward = fwd)
      assert(canon(bcast) === canon(merge), s"forward=$fwd")
    }
  }

  test("broadcast variant plan: zero exchanges and zero sorts on the fact side") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "t",
        Seq("payload"), broadcastRight = true).queryExecution.executedPlan
      val execs = plan.collect { case e: graft.plans.AsOfBroadcastJoinExec => e }
      assert(execs.size === 1, s"expected the broadcast exec:\n$plan")
      // the fact side feeds the probe untouched: no shuffle, no sort
      assert(execs.head.left.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, s"fact side must not exchange or sort:\n$plan")
      assert(plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }.size === 1, s"dimension side broadcasts once:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  // plan.collect treats AdaptiveSparkPlanExec/QueryStageExec as leaves;
  // expand them so the executed (post-AQE) exec nodes are visible
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allNodes(q.plan)
    case other => other.children.flatMap(allNodes)
  })

  test("SQLMetrics: both execs report output/matched rows in the executed plan") {
    // merge exec
    val native = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "t",
      Seq("payload"))
    native.collect()
    val mergeExec = allNodes(native.queryExecution.executedPlan).collect {
      case e: graft.plans.AsOfJoinExec => e }.head
    assert(mergeExec.metrics.keySet === Set("numOutputRows", "numMatched"))
    assert(mergeExec.metrics("numOutputRows").value === 7,
      "every left row is output (left-outer semantics)")
    assert(mergeExec.metrics("numMatched").value === 3,
      "ids 1, 2, 5 match backward; NULL key/ts and no-match rows don't")
    // broadcast exec
    val bcast = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "t",
      Seq("payload"), broadcastRight = true)
    bcast.collect()
    val bcastExec = allNodes(bcast.queryExecution.executedPlan).collect {
      case e: graft.plans.AsOfBroadcastJoinExec => e }.head
    assert(bcastExec.metrics.keySet ===
      Set("numOutputRows", "numMatched", "indexBuilds", "buildTime"))
    assert(bcastExec.metrics("numOutputRows").value === 7)
    assert(bcastExec.metrics("numMatched").value ===
      mergeExec.metrics("numMatched").value,
      "both renditions agree on the match count")
  }

  test("broadcast index is built once per executor, not once per task") {
    // many fact partitions in one executor JVM (local mode = one
    // executor): without the AsOfIndexCache memoization every task
    // rebuilds the per-key timeline index from the broadcast rows
    val manyParts = left.repartition(8)
    val bcast = TemporalOps.asofJoinNative(manyParts, right, Seq("k"), "t", "t",
      Seq("payload"), broadcastRight = true)
    val before = graft.plans.AsOfIndexCache.builds.get()
    bcast.collect()
    val built = graft.plans.AsOfIndexCache.builds.get() - before
    assert(built === 1,
      s"8 fact partitions must share ONE index build in this JVM, saw $built")
    val exec = allNodes(bcast.queryExecution.executedPlan).collect {
      case e: graft.plans.AsOfBroadcastJoinExec => e }.head
    assert(exec.metrics("indexBuilds").value === 1,
      "the SQLMetric mirrors the per-executor build count")
  }

  test("grouped as-of: k feature tables equal k chained two-sided as-ofs") {
    // three feature tables with overlapping/disjoint timelines
    val f1 = Seq((10L, ts(10), 1.0), (10L, ts(60), 2.0), (30L, ts(100), 3.0))
      .toDF("k", "t", "a")
    val f2 = Seq((10L, ts(50), "x"), (20L, ts(5), "y")).toDF("k", "t", "b")
    val f3 = Seq((10L, ts(100), 7L)).toDF("k", "t", "c")
    val grouped = TemporalOps.asofJoinFeatures(left,
      Seq(("f1", f1, Seq("a")), ("f2", f2, Seq("b")), ("f3", f3, Seq("c"))),
      Seq("k"), "t", "t")
    // reference: three independent two-sided as-ofs composed by id
    val r1 = TemporalOps.asofJoin(left, f1, Seq("k"), "t", "t", Seq("a"), "f1_")
      .select(col("id"), col("f1_a"), col("f1_ts"))
    val r2 = TemporalOps.asofJoin(left, f2, Seq("k"), "t", "t", Seq("b"), "f2_")
      .select(col("id"), col("f2_b"), col("f2_ts"))
    val r3 = TemporalOps.asofJoin(left, f3, Seq("k"), "t", "t", Seq("c"), "f3_")
      .select(col("id"), col("f3_c"), col("f3_ts"))
    val expected = r1.join(r2, "id").join(r3, "id")
      .select(col("id"), col("f1_a"), col("f1_ts"), col("f2_b"), col("f2_ts"),
        col("f3_c"), col("f3_ts"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val actual = grouped
      .select(col("id"), col("f1_a"), col("f1_ts"), col("f2_b"), col("f2_ts"),
        col("f3_c"), col("f3_ts"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(actual === expected)
  }

  test("grouped as-of plan: ONE exchange and ONE sort total, not one per feature table") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val f1 = Seq((10L, ts(10), 1.0)).toDF("k", "t", "a")
      val f2 = Seq((10L, ts(50), "x")).toDF("k", "t", "b")
      val f3 = Seq((10L, ts(100), 7L)).toDF("k", "t", "c")
      val plan = TemporalOps.asofJoinFeatures(left,
        Seq(("f1", f1, Seq("a")), ("f2", f2, Seq("b")), ("f3", f3, Seq("c"))),
        Seq("k"), "t", "t").queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exchanges.size === 1,
        s"the spine and ALL feature tables must shuffle as one union:\n$plan")
      val sorts = plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }
      assert(sorts.size === 1, s"one timeline sort total:\n$plan")
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(windows.size === 1,
        s"all k carries run in ONE window exec:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("broadcast probe fuses into whole-stage codegen: the fact pipeline does not break at the join") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = TemporalOps.asofJoinNative(
        left.filter(col("id") > 0), right, Seq("k"), "t", "t",
        Seq("payload"), broadcastRight = true)
      val plan = df.queryExecution.executedPlan
      val codegenSpans = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
      val fused = codegenSpans.exists(_.collect {
        case e: graft.plans.AsOfBroadcastJoinExec => e }.nonEmpty)
      assert(fused,
        s"the probe must sit INSIDE a WholeStageCodegen span (scan → " +
          s"filter → probe in one generated function):\n$plan")
      // and the generated path EXECUTES compiled — fallback=false turns
      // a janino compile failure (e.g. a double-emitted payload local)
      // into a hard error instead of a silent interpreted de-opt
      val prevFb = spark.conf.get("spark.sql.codegen.fallback")
      val viaCodegen = try {
        spark.conf.set("spark.sql.codegen.fallback", "false")
        df.collect().map(_.toSeq).sortBy(_.toString)
      } finally spark.conf.set("spark.sql.codegen.fallback", prevFb)
      val prevWsc = spark.conf.get("spark.sql.codegen.wholeStage")
      val viaIterator = try {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        TemporalOps.asofJoinNative(
          left.filter(col("id") > 0), right, Seq("k"), "t", "t",
          Seq("payload"), broadcastRight = true)
          .collect().map(_.toSeq).sortBy(_.toString)
      } finally spark.conf.set("spark.sql.codegen.wholeStage", prevWsc)
      assert(viaCodegen === viaIterator,
        "generated and iterator renditions must agree row-for-row")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("tolerance: a staler-than-bound match nulls out, boundary-exact matches keep, all renditions agree") {
    // timeline: id1 probes at 100s, latest right at 100s (dist 0);
    // id2 probes at 50s, latest right at 10s (dist 40s); id3 at 5s, no
    // earlier right. With tolerance 30s: id2's match is TOO STALE.
    val tol = Some(30L * 1000000)
    val decl = TemporalOps.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("payload"), toleranceMicros = tol)
    assert(canon(decl) === Seq(
      (1L, Some(100000000L), Some("c")),  // dist 0 <= 30s
      (2L, None, None),                   // dist 40s > 30s: nulled
      (3L, None, None), (4L, None, None),
      (5L, Some(100000000L), Some("tie")),
      (6L, None, None), (7L, None, None)))
    // boundary-exact: tolerance 40s keeps id2 (inclusive contract)
    val atBound = TemporalOps.asofJoin(left, right, Seq("k"), "t", "t",
      Seq("payload"), toleranceMicros = Some(40L * 1000000))
    assert(canon(atBound)(1) === ((2L, Some(10000000L), Some("a"))))
    // every native rendition agrees with the declarative one
    for (bcast <- Seq(false, true)) {
      val native = TemporalOps.asofJoinNative(left, right, Seq("k"), "t", "t",
        Seq("payload"), broadcastRight = bcast, toleranceMicros = tol)
      assert(canon(native) === canon(decl), s"broadcast=$bcast")
    }
    // forward direction: distance measures the other way
    val fwd = TemporalOps.asofJoinForward(left, right, Seq("k"), "t", "t",
      Seq("payload"), toleranceMicros = Some(10L * 1000000))
    assert(canon(fwd) === Seq(
      (1L, Some(100000000L), Some("c")),  // dist 0
      (2L, Some(60000000L), Some("b")),   // next at 60s, dist 10s == tol
      (3L, Some(10000000L), Some("a")),   // next at 10s, dist 5s
      (4L, None, None),
      (5L, Some(100000000L), Some("tie")),
      (6L, None, None), (7L, None, None)))
  }

  test("AsOfIndexCache is bounded: entries past the LRU cap evict, recent entries hit") {
    import graft.plans.AsOfIndexCache
    def buildsFor(key: String): Long = {
      val b0 = AsOfIndexCache.builds.get()
      AsOfIndexCache.getOrBuild(key, () => new Object)
      AsOfIndexCache.builds.get() - b0
    }
    // fill well past the cap (8) with fresh keys — each builds once
    for (i <- 1 to 12) assert(buildsFor(s"lru-spec-$i") === 1)
    // the most recent keys are still cached (no rebuild)...
    assert(buildsFor("lru-spec-12") === 0)
    assert(buildsFor("lru-spec-11") === 0)
    // ...while the oldest were evicted to keep executor memory bounded
    assert(buildsFor("lru-spec-1") === 1,
      "an entry beyond the LRU cap must have been evicted")
  }

  test("cross-side type mismatches fail loudly at construction, not as silent non-matches") {
    // int key vs long key: the broadcast probe compares UnsafeRow bytes
    // across sides — without validation it would match NOTHING
    val intKeyLeft = left.withColumn("k", col("k").cast("int"))
    val e1 = intercept[IllegalArgumentException] {
      TemporalOps.asofJoinNative(intKeyLeft, right, Seq("k"), "t", "t",
        Seq("payload"))
    }
    assert(e1.getMessage.contains("type mismatch"))
    // long ts vs timestamp ts: the merge would read right values with
    // left types — ClassCastException or garbage ordering
    val longTsLeft = left.withColumn("t", unix_micros(col("t")))
    val e2 = intercept[IllegalArgumentException] {
      TemporalOps.asofJoinNative(longTsLeft, right, Seq("k"), "t", "t",
        Seq("payload"))
    }
    assert(e2.getMessage.contains("timestamp type mismatch"))
  }

  test("differential on generated data: dense keys, repeated timestamps, both directions") {
    // deterministic generated fixture: 40 keys x dense timeline with
    // repeated (key, ts) pressure on the left (right stays unique per
    // (key, ts) — the documented contract)
    val l = spark.range(2000).select(
      col("id"),
      (col("id") % 40).as("k"),
      expr("timestamp_micros((id * 7919) % 1000 * 1000000)").as("t"))
    val r = spark.range(700).select(
      (col("id") % 40).as("k"),
      expr("timestamp_micros((id * 104729) % 997 * 1000000)").as("t"),
      concat(lit("p"), col("id")).as("payload"))
      .groupBy("k", "t").agg(max("payload").as("payload"))
    for (fwd <- Seq(false, true)) {
      val decl =
        if (fwd) TemporalOps.asofJoinForward(l, r, Seq("k"), "t", "t", Seq("payload"))
        else TemporalOps.asofJoin(l, r, Seq("k"), "t", "t", Seq("payload"))
      val e = decl.select("id", "asof_ts", "asof_payload")
        .collect().map(_.toSeq).sortBy(_.toString)
      for (bcast <- Seq(false, true)) {
        val native = TemporalOps.asofJoinNative(l, r, Seq("k"), "t", "t",
          Seq("payload"), forward = fwd, broadcastRight = bcast)
        val n = native.select("id", "asof_ts", "asof_payload")
          .collect().map(_.toSeq).sortBy(_.toString)
        assert(n === e,
          s"forward=$fwd broadcast=$bcast: native and declarative diverge")
      }
      // tolerance: every rendition must null out the SAME stale
      // matches; the reference is the declarative result post-filtered
      // independently (distance computed from the collected rows)
      val tol = 100L * 1000000
      val eTol = decl.select("id", "t", "asof_ts", "asof_payload")
        .collect().map { row =>
          val keep = !row.isNullAt(2) && {
            val lts = row.getTimestamp(1).getTime * 1000
            val mts = row.getTimestamp(2).getTime * 1000
            (if (fwd) mts - lts else lts - mts) <= tol
          }
          Seq(row.get(0),
            if (keep) row.get(2) else null,
            if (keep) row.get(3) else null)
        }.sortBy(_.toString)
      for (bcast <- Seq(false, true)) {
        val nTol = TemporalOps.asofJoinNative(l, r, Seq("k"), "t", "t",
          Seq("payload"), forward = fwd, broadcastRight = bcast,
          toleranceMicros = Some(tol))
          .select("id", "asof_ts", "asof_payload")
          .collect().map(_.toSeq).sortBy(_.toString)
        assert(nTol === eTol,
          s"forward=$fwd broadcast=$bcast: tolerance semantics diverge " +
            "from the independent post-filter")
      }
    }
    // grouped as-of on the same generator: three feature tables with
    // overlapping key coverage must equal three independent two-sided
    // as-ofs composed by id
    val f1 = spark.range(300).select((col("id") % 40).as("k"),
      expr("timestamp_micros((id * 31) % 997 * 1000000)").as("t"),
      (col("id") * 2).as("a")).groupBy("k", "t").agg(max("a").as("a"))
    val f2 = spark.range(150).select((col("id") % 25).as("k"),
      expr("timestamp_micros((id * 57) % 991 * 1000000)").as("t"),
      concat(lit("b"), col("id")).as("b")).groupBy("k", "t").agg(max("b").as("b"))
    val f3 = spark.range(80).select((col("id") % 10).as("k"),
      expr("timestamp_micros((id * 101) % 983 * 1000000)").as("t"),
      (col("id") % 7).as("c")).groupBy("k", "t").agg(max("c").as("c"))
    val grouped = TemporalOps.asofJoinFeatures(l,
      Seq(("f1", f1, Seq("a")), ("f2", f2, Seq("b")), ("f3", f3, Seq("c"))),
      Seq("k"), "t", "t")
      .select("id", "f1_a", "f1_ts", "f2_b", "f2_ts", "f3_c", "f3_ts")
      .collect().map(_.toSeq).sortBy(_.toString)
    val composed = TemporalOps.asofJoin(l, f1, Seq("k"), "t", "t", Seq("a"), "f1_")
      .select(col("id"), col("f1_a"), col("f1_ts"))
      .join(TemporalOps.asofJoin(l, f2, Seq("k"), "t", "t", Seq("b"), "f2_")
        .select(col("id"), col("f2_b"), col("f2_ts")), "id")
      .join(TemporalOps.asofJoin(l, f3, Seq("k"), "t", "t", Seq("c"), "f3_")
        .select(col("id"), col("f3_c"), col("f3_ts")), "id")
      .select("id", "f1_a", "f1_ts", "f2_b", "f2_ts", "f3_c", "f3_ts")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(grouped === composed,
      "grouped as-of diverges from composed two-sided as-ofs on generated data")
  }
}
