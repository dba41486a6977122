package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape regression guard over the ENTIRE registry: the scale
  * rules the manual `Explain` audits enforce, pinned as a spec so a
  * refactor can't silently reintroduce an all-pairs join or a
  * sort-everything global window. AQE is disabled for the inspection
  * (AdaptiveSparkPlanExec is a leaf and hides its children from
  * collect), so these are the static plans Catalyst commits to.
  */
class PlanAuditSpec extends SparkSpec {

  // intentional exceptions, each with a reason the scaladoc of the
  // query documents:
  private val cartesianAllowed = Set(
    "q_join_cross") // the CROSS JOIN parity operator itself
  private val globalWindowAllowed = Set(
    "q_surrogate_key") // reference-parity global row_number over a
                       // dim-scale table; scalableSurrogateKey is the
                       // 100 TB path

  private def plans = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.registry.map { q =>
        q.name -> (try Some(q.run(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan)
        catch { case _: Throwable => None })
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("no registry query plans a cartesian product or an unpartitioned window") {
    val offenders = plans.flatMap { case (name, planOpt) =>
      planOpt.toSeq.flatMap { plan =>
        val cart = plan.collect { case c: CartesianProductExec => c }.nonEmpty
        val globalWin = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.nonEmpty
        Seq(
          if (cart && !cartesianAllowed(name)) Some(s"$name: CartesianProduct") else None,
          if (globalWin && !globalWindowAllowed(name)) Some(s"$name: global Window") else None
        ).flatten
      }
    }
    assert(offenders.isEmpty, s"plan-shape violations:\n  ${offenders.mkString("\n  ")}")
  }

  test("q_quality_pct_rank has no window partitioned on source alone") {
    // the r7 weak: a per-source rank window is a single-task sort of a
    // dominant source at 100 TB. The query must plan its windows over
    // (source, band) — every WindowExec needs >= 2 partition keys.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val offenders = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.queries.TextQueries.qQualityPctRank
        .run(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
        .collect { case w: WindowExec if w.partitionSpec.size < 2 => w }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(offenders.isEmpty,
      s"window partitioned on fewer than 2 keys:\n  ${offenders.mkString("\n  ")}")
  }

  test("q_percentiles is sketch-anchored: no exact percentile value buffer in its plan") {
    // exact `percentile` keeps a value→count map per group — over the
    // near-unique l_extendedprice that buffer approaches the full column
    // on one reducer at scale. The query must plan approx_percentile
    // (bounded mergeable sketch) and nothing percentile-exact.
    val plan = graft.queries.SqlQueries.qPercentiles
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile"),
      "expected the approx_percentile sketch aggregate")
    assert("(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty,
      s"exact percentile aggregate found in plan:\n$plan")
  }

  test("q_corpus_curate bounds enter the plan as literals, not an exact percentile") {
    // the r8 weak: p10/p90 via exact `percentile()` is the same
    // one-reducer value buffer. Bounds must come from Selection's
    // histogram narrowing and appear as pushed filter literals —
    // no percentile aggregate, no bounds crossJoin, in the final plan.
    val plan = graft.queries.TextQueries.qCorpusCurate
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty,
      s"exact percentile aggregate found in plan:\n$plan")
    assert(!plan.contains("NestedLoopJoin"),
      s"bounds crossJoin found in plan (expected literal filter):\n$plan")
  }

  test("q_centroid_classify scores map-side: no join and no aggregation in its plan") {
    // the model is a literal (fit collected at plan construction, a
    // labels·dims bounded collect) — scoring must therefore plan as a
    // scan + project + the output sort, never a centroid join or a
    // per-vector aggregation. A join/aggregate appearing here means the
    // model stopped being a parameter and became data.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.queries.SimilarityQueries.qCentroidClassify
        .run(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
    assert(joins.isEmpty, s"join found in scoring plan:\n$plan")
    assert(aggs.isEmpty, s"aggregation found in scoring plan:\n$plan")
  }

  test("q_priority_sample plans a TakeOrdered, never a full global sort") {
    // the exact-k sample must be a per-partition top-k with a k-row
    // driver merge; a Sort+Exchange here would materialize a total
    // order of the corpus for 100 rows of output.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.queries.CurationQueries.qPrioritySample
        .run(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
    val sorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s }
    assert(sorts.isEmpty, s"global sort found in sample plan:\n$plan")
  }

  test("q_feature_hashing shuffles nothing but its output order") {
    // the hashing trick is pure map work: the only Exchange allowed is
    // the RangePartitioning behind the deterministic output ORDER BY —
    // a hash shuffle appearing here means a vocabulary/aggregation
    // crept back in.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.queries.TextQueries.qFeatureHashing
        .run(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val hashShuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => e
    }
    assert(hashShuffles.isEmpty,
      s"non-sort shuffle in feature-hashing plan:\n$plan")
  }

  test("rank<=k per-group filters plan the WindowGroupLimit pre-filter") {
    // Spark's InferWindowGroupLimit turns `row_number() over (...)
    // <= k` into a per-partition top-k heap BEFORE the full window
    // sort — the difference between sorting every group and keeping k
    // rows per group at 100 TB. Pin that the canonical rank-filtered
    // query still triggers it (a restructured filter can silently stop
    // matching and regress to the full sort).
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = queries.AggQueries.qHourlyTopTypes
        .run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      val hits = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
      }
      assert(hits.nonEmpty,
        s"q_hourly_top_types lost its WindowGroupLimit pre-filter:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q_pit_features: three feature tables, ONE window and ONE hash exchange") {
    // the grouped as-of contract at gate data: all k carries run in a
    // single WindowExec over one union shuffle — a per-feature chain
    // would plan k windows (and k sorts), multiplying the shuffle
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = graft.queries.EventQueries.qPitFeatures
        .run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(windows.size === 1,
        s"3 feature carries must share ONE WindowExec:\n$plan")
      // the carry shuffle hashes on the join key ALONE; the three
      // per-feature (user_id, ts) dedup aggregations are input prep,
      // not part of the as-of — the as-of itself contributes exactly
      // one exchange however many feature tables join
      val carryEx = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if (e.outputPartitioning match {
            case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
              h.expressions.map(_.sql) == Seq("user_id")
            case _ => false
          }) => e }
      assert(carryEx.size === 1,
        s"spine + 3 feature tables must shuffle as ONE union on the key:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q_dsv2_catalog_read: the IN partition filter is consumed by the scan and prunes splits") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = graft.queries.ParityQueries.qDsv2CatalogRead
        .run(spark, "/root/testdata/sf0.001")
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      assert(scans.size === 1, "one catalog-table scan")
      assert(scans.head.scan.description().contains("In(l_returnflag"),
        s"the partition filter must be PUSHED, not residual: " +
          scans.head.scan.description())
      // pruning is real: the filtered table plans fewer splits than
      // the unfiltered one (A,R of the 3 returnflag partitions)
      val filteredSplits = spark.table("graft_dyn.flags_read")
        .filter(org.apache.spark.sql.functions.col("l_returnflag")
          .isin("A", "R")).rdd.getNumPartitions
      val allSplits = spark.table("graft_dyn.flags_read").rdd.getNumPartitions
      assert(filteredSplits < allSplits,
        s"IN-filter must drop the N partition's splits " +
          s"($filteredSplits vs $allSplits)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q_tpch_q6: every predicate reaches the scan; projection reads 4 of 11 columns") {
    // Q6 is the pure-I/O query: if any of its four predicates falls out
    // of PushedFilters, or the scan reads columns the aggregate never
    // touches, the whole query's 100 TB cost model breaks
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = queries.ParityQueries.qTpchQ6
        .run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      val scans = plan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }
      assert(scans.size === 1, s"Q6 is one scan:\n$plan")
      val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
      for (frag <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05", "LessThanOrEqual(l_discount,0.07",
        "LessThan(l_quantity,24"))
        assert(pushed.contains(frag), s"missing pushed filter $frag in $pushed")
      val readCols = scans.head.metadata.getOrElse("ReadSchema", "")
      for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"))
        assert(readCols.contains(c), s"ReadSchema lost $c: $readCols")
      assert(!readCols.contains("l_orderkey") && !readCols.contains("l_tax"),
        s"Q6 scan reads columns it never uses: $readCols")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q_tpch_q9: infix LIKE pushes to the part scan; part side collapses first") {
    // Q9's plan lives or dies on two decisions at 100 TB: the
    // `p_name LIKE '%gear%'` residual must reach the part scan as a
    // PushedFilter (StringContains — row-group skipping plus no
    // post-scan filter stage over the full part table), and the
    // filtered part list + supplier→nation map must BROADCAST into
    // the lineitem scan so only the ~13 % matching fact rows reach
    // the lineitem⋈orders join.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = queries.ParityQueries.qTpchQ9
        .run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      val partScanPush = plan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec
            if sc.metadata.get("Location").exists(_.contains("part.parquet")) =>
          sc.metadata.getOrElse("PushedFilters", "")
      }
      assert(partScanPush.exists(_.contains("StringContains(p_name,gear)")),
        s"p_name LIKE '%gear%' not pushed to the part scan: $partScanPush\n$plan")
      val bhj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(bhj.size >= 2,
        s"expected part + supplier→nation broadcasts, found ${bhj.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
