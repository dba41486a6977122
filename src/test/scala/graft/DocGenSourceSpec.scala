package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Plan-level proofs for the DocGenSource DataSource V2 connector:
  * filters genuinely narrow the generated range (not post-filter), and
  * pruning genuinely narrows generation (not post-project).
  */
class DocGenSourceSpec extends SparkSpec {

  private def read(rows: Long = 1000L) =
    spark.read.format("graft.sources.DocGenSource")
      .option("rows", rows.toString).load()

  private def batchScan(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(scans.size == 1, s"expected one BatchScan: ${df.queryExecution.executedPlan}")
      scans.head
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("doc_id range filter is fully pushed: narrowed scan, no FilterExec left") {
    val df = read().filter(col("doc_id") >= 100 && col("doc_id") < 110)
    val plan = df.queryExecution.executedPlan
    val filters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(filters.isEmpty, s"residual FilterExec — pushdown not fully handled:\n$plan")
    assert(batchScan(df).scan.description().contains("[100, 110)"),
      s"scan range not narrowed: ${batchScan(df).scan.description()}")
    assert(df.count() == 10)
    assert(df.agg(min("doc_id"), max("doc_id")).collect()(0).toSeq == Seq(100L, 109L))
  }

  test("column pruning reaches the generator: readSchema is the projection") {
    val df = read().select(col("doc_id"), col("lang"))
    assert(batchScan(df).scan.readSchema().fieldNames.toSeq == Seq("doc_id", "lang"),
      "scan must generate only the requested columns")
    assert(df.count() == 1000)
  }

  test("generated rows are the deterministic function both engines share") {
    val r = read(50).orderBy(col("doc_id")).collect()
    assert(r.length == 50)
    val row0 = r(0)
    assert(row0.getAs[Long]("doc_id") == 0L)
    assert(row0.getAs[String]("text") ==
      (0L until 10L).map(i => graft.sources.DocGenSource.words(
        graft.sources.DocGenSource.wordIdx(0L, i))).mkString(" "))
    assert(row0.getAs[Long]("n_chars") == row0.getAs[String]("text").length.toLong)
    assert(r(7).getAs[String]("lang") == "es")   // 7 % 5 = 2 -> es
    assert(r(13).getAs[String]("source") == "src13")
    // rerun is bit-identical (pure function of id)
    assert(read(50).orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      == r.map(_.toSeq).toSeq)
  }

  test("COUNT/MIN/MAX push completely into the source: no aggregate exec, filters compose") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = read(1000).filter(col("doc_id") >= 200 && col("doc_id") < 700)
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      val aggs = df.queryExecution.executedPlan.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
      assert(aggs.isEmpty,
        s"aggregate exec found — pushdown not complete:\n${df.queryExecution.executedPlan}")
      assert(df.collect()(0).toSeq == Seq(500L, 200L, 699L),
        "pushed aggregation must see the filter-narrowed range")
      // empty range: count 0, null extrema — same as a real aggregation
      val e = read(1000).filter(col("doc_id") < 0)
        .agg(count(lit(1)), min(col("doc_id")), max(col("doc_id"))).collect()(0)
      assert(e.getLong(0) == 0L && e.isNullAt(1) && e.isNullAt(2))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("LIMIT pushes into the generator and composes with filters") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = read(1000).filter(col("doc_id") >= 300).limit(5)
      assert(batchScan(df).scan.description().contains("[300, 305)"),
        s"limit not composed with the pushed filter: ${batchScan(df).scan.description()}")
      assert(df.collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(300L, 301L, 302L, 303L, 304L))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("scan reports exact filter-narrowed statistics to the optimizer") {
    val df = read(1000).filter(col("doc_id") < 250)
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(250)),
      s"optimizer must see the narrowed row count: $stats")
  }

  test("partitioning splits the id range evenly and respects pushdown bounds") {
    val df = read(1000).filter(col("doc_id") < 500)
    // 8 partitions over [0, 500): every partition generates its slice only
    val parts = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(parts.sum == 500)
    assert(parts.forall(s => s >= 500 / 8 && s <= 500 / 8 + 1),
      s"uneven generation slices: ${parts.toSeq}")
  }
}
