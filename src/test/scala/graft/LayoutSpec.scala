package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Pins the z-order layout operator: the Morton value itself, and the
  * GEOMETRY that justifies it — on a uniform 64×64 grid written in
  * 256-row chunks, z-order tiles the plane with 16×16 cells, so a band
  * query on EITHER dimension touches a quarter of the chunks, while a
  * single-column sort leaves the other dimension's extent at the full
  * 64 in every chunk (band queries on it touch everything).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (known Morton values)") {
    val out = Seq((3L, 2L), (0L, 0L), (63L, 0L), (0L, 63L), (5L, 10L))
      .toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 6).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // morton(3,2)=13; morton(63,0)=0b010101010101; morton(0,63)=0b101010101010
    // morton(5,10): x bits {0,2}→pos{0,4}; y bits {1,3}→pos{3,7} = 17+136
    assert(out == Seq(13L, 0L, 1365L, 2730L, 153L))
  }

  test("z-order layout bounds BOTH dimensions per chunk; 1-D sort only its own") {
    val n = 64
    val grid = (0 until n * n).map(i => (i % n, i / n))
    def chunksOf(sorted: Seq[(Int, Int)]): Seq[Seq[(Int, Int)]] =
      sorted.grouped(256).toSeq
    def touched(chunks: Seq[Seq[(Int, Int)]], pick: ((Int, Int)) => Int,
                lo: Int, hi: Int): Int =
      chunks.count { c =>
        val vs = c.map(pick); vs.min <= hi && vs.max >= lo
      }
    // drive the ordering through the OPERATOR (collect preserves the
    // zOrderBy sort: range partitions are ordered and each is sorted)
    val zSorted = Layout.zOrderBy(grid.toDF("x", "y"), col("x"), col("y"), bits = 6)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val xSorted = grid.sortBy(identity)
    val zChunks = chunksOf(zSorted)
    val xChunks = chunksOf(xSorted)
    assert(zChunks.size == 16 && xChunks.size == 16)
    // z-order: every 256-row chunk is one 16×16 tile — extent 16 in BOTH
    zChunks.foreach { c =>
      assert(c.map(_._1).max - c.map(_._1).min == 15)
      assert(c.map(_._2).max - c.map(_._2).min == 15)
    }
    // band query y ∈ [0, 15]: z-order touches its 4 tiles; the x-sorted
    // layout spans y fully in every chunk — all 16 touched
    assert(touched(zChunks, _._2, 0, 15) == 4)
    assert(touched(xChunks, _._2, 0, 15) == 16)
    // the x-band query stays prunable under z-order too (4 tiles, vs 4
    // chunks for the layout sorted by x itself — nothing is given up
    // beyond constant factors)
    assert(touched(zChunks, _._1, 0, 15) == 4)
    assert(touched(xChunks, _._1, 0, 15) == 4)
  }

  test("written z-clustered parquet actually prunes: scan metrics on a band query") {
    // the end-to-end pin the tile-math test can't give: WRITE the
    // layout, SCAN with a band predicate, and read Spark's own scan
    // metrics. Each of the 16 files is one 16×16 tile (one parquet row
    // group); the parquet reader skips row groups whose y min/max miss
    // the band, so the scan DECODES only the 4 matching tiles' rows.
    // The x-sorted control layout spans y fully in every file — nothing
    // can be skipped and all 4096 rows decode.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val n = 64
    val grid = (0 until n * n).map(i => (i % n, i / n))
    val dir = tmpDir("zorder-scan")
    Layout.zOrderBy(grid.toDF("x", "y"), col("x"), col("y"), bits = 6,
        numPartitions = Some(16))
      .drop("z_value").write.parquet(s"$dir/z")
    grid.toDF("x", "y").repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")).write.parquet(s"$dir/x")
    def scanStats(path: String): (Long, Long) = {
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val q = spark.read.parquet(path).filter(col("y").between(0, 15))
        // collect() executes q's OWN physical plan (a separate count()
        // would build a new one and leave these metrics empty)
        assert(q.collect().length == 1024) // both layouts agree on the answer
        val scan = q.queryExecution.executedPlan.collectLeaves()
          .collectFirst { case f: FileSourceScanExec => f }.get
        (scan.metrics("numOutputRows").value, scan.metrics("numFiles").value)
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    val (zRows, zFiles) = scanStats(s"$dir/z")
    val (xRows, xFiles) = scanStats(s"$dir/x")
    assert(zFiles == 16 && xFiles == 16) // identical listings —
    // the difference below is row-group pruning, not partition pruning
    assert(zRows == 1024L, s"z-layout decoded $zRows rows; pruning did not engage")
    assert(xRows == 4096L, s"x-layout decoded $xRows rows; expected no pruning possible")
  }
}
