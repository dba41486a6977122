package graft

import org.apache.spark.sql.functions._

/** Runtime row-level Bloom-filter join pruning — Spark's own
  * InjectRuntimeFilter, pinned working under this engine's session.
  *
  * At 100 TB the classic win: a selective dimension-side filter
  * builds a Bloom filter at runtime that prunes the fact-side SCAN
  * before the shuffle, so the big side never shuffles rows the join
  * would drop. This spec proves the injection actually fires for the
  * engine's canonical fact⋈filtered-dim shape (thresholds lowered to
  * testdata scale — at production scale the defaults 10MB/10GB choose
  * candidates by stats) and that results are unchanged.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a Bloom filter into the fact-side scan") {
    val d = "/root/testdata/sf0.001"
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // testdata is KBs; production keeps the stats-driven defaults
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      // force the shuffle-join path: broadcast joins reuse their own
      // build side instead of a runtime filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      def q = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d)
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("BloomFilterMightContain") ||
        optimized.toLowerCase.contains("bloom"),
        s"no runtime bloom filter injected:\n$optimized")
      val n = q.collect()(0).getLong(1)
      // unchanged semantics vs the un-filtered plan
      withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        assert(q.collect()(0).getLong(1) == n)
      }
      assert(n > 0, "fixture must exercise the join")
    }
  }
}
