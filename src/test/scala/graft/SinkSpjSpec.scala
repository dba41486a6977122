package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** STORAGE-PARTITIONED JOIN, compound-key shape: both sink tables are
  * partitioned on `p`, the join is on `(p, k)` — partition keys a
  * strict SUBSET of the join keys, the fact-⋈-fact production case
  * (the pure `p = p` equi-join is pinned in PartitionedSinkSpec). The
  * scan's KeyGroupedPartitioning satisfies the join's clustered
  * distribution, so the plan carries ZERO shuffle exchanges: only the
  * within-group sorts run. At 100 TB neither fact side broadcasts and
  * a keyed shuffle of either would be the job's whole cost — the
  * co-partitioned layout is what makes the join linear.
  */
class SinkSpjSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.SparkPlan

  // plan.collect treats AdaptiveSparkPlanExec/QueryStageExec as
  // leaves; expand so post-AQE exec nodes are visible
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allNodes(q.plan)
    case other => other.children.flatMap(allNodes)
  })

  private def mkCatalog(name: String): Unit = {
    val root = tmpDir(s"spj_$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.PartitionedSinkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
  }

  test("compound-key join (p, k) on co-partitioned sink tables plans zero exchanges") {
    mkCatalog("graft_spjc")
    Seq((1L, 10.0, "A"), (2L, 20.0, "A"), (3L, 30.0, "B"), (4L, 40.0, "C"))
      .toDF("k", "v", "p")
      .writeTo("graft_spjc.l").partitionedBy(col("p")).create()
    Seq((1L, "x", "A"), (2L, "y", "A"), (3L, "x", "B"), (5L, "z", "C"))
      .toDF("rk", "tag", "rp")
      .writeTo("graft_spjc.r").partitionedBy(col("rp")).create()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = spark.table("graft_spjc.l")
      val r = spark.table("graft_spjc.r")
      val joined = l.join(r, col("p") === col("rp") && col("k") === col("rk"))
        .select(col("p"), col("k"), col("v"), col("tag"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"partition keys (p) are a subset of the join keys (p, k) and the " +
          s"layouts are co-clustered — the join must be storage-partitioned:\n" +
          joined.queryExecution.executedPlan)
      assert(joined.collect().map(r0 =>
        (r0.getString(0), r0.getLong(1), r0.getDouble(2), r0.getString(3))).toSet
        === Set(("A", 1L, 10.0, "x"), ("A", 2L, 20.0, "y"), ("B", 3L, 30.0, "x")))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBt)
    }
    spark.sql("DROP TABLE graft_spjc.l")
    spark.sql("DROP TABLE graft_spjc.r")
  }

  test("merge hint keeps the compound-key SPJ shuffle-free under AQE (the q_dsv2_spj plan)") {
    mkCatalog("graft_spjh")
    Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "B"))
      .toDF("k", "v", "p")
      .writeTo("graft_spjh.l").partitionedBy(col("p")).create()
    Seq((1L, "F", "A"), (2L, "O", "B"), (3L, "F", "B"))
      .toDF("rk", "st", "rp")
      .writeTo("graft_spjh.r").partitionedBy(col("rp")).create()
    val l = spark.table("graft_spjh.l")
    val r = spark.table("graft_spjh.r").filter(col("st") === "F")
    // no orderBy here — a global sort legitimately plans a range
    // exchange; the shuffle-free claim is about the join + rollup
    val agg = l.join(r.hint("merge"),
        col("p") === col("rp") && col("k") === col("rk"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val rows = agg.collect()
    val exchanges = allNodes(agg.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"merge-hinted co-partitioned join + partition-column rollup must " +
        s"plan zero exchanges end-to-end:\n${agg.queryExecution.executedPlan}")
    assert(rows.map(r0 => (r0.getString(0), r0.getLong(1), r0.getDouble(2)))
      .sortBy(_._1).toSeq === Seq(("A", 1L, 10.0), ("B", 1L, 30.0)))
    spark.sql("DROP TABLE graft_spjh.l")
    spark.sql("DROP TABLE graft_spjh.r")
  }

  test("one-side shuffle: a plain relation joining a sink table shuffles only itself into the key groups") {
    mkCatalog("graft_spjs")
    Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "v", "p")
      .writeTo("graft_spjs.l").partitionedBy(col("p")).create()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = spark.table("graft_spjs.l")
      // not a sink table — and carrying a key ("D") absent from the
      // table's partition values, which must simply never match
      val r = Seq(("A", "x"), ("B", "y"), ("D", "z")).toDF("rp", "tag")
      val joined = l.join(r.hint("merge"), col("p") === col("rp"))
        .select(col("p"), col("k"), col("tag"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"the sink side is already key-grouped on p — only the plain " +
          s"relation must shuffle:\n${joined.queryExecution.executedPlan}")
      assert(!exchanges.head.toString.contains("PartitionedSinkScan"),
        s"the one exchange must sit on the NON-sink side:\n${exchanges.head}")
      assert(joined.collect().map(r0 =>
        (r0.getString(0), r0.getLong(1), r0.getString(2))).toSet ===
        Set(("A", 1L, "x"), ("B", 2L, "y")))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBt)
    }
    spark.sql("DROP TABLE graft_spjs.l")
  }
}
