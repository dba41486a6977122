package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Publish-protocol pins that need staged names the public API cannot
  * mint: Spark's task ids restart at 0 per APPLICATION, so two batch
  * appends from different driver JVMs can stage files with the SAME
  * `part-<partitionId>-<taskId>-<value>.tsv` name — and publish's
  * delete-before-rename (required for streaming epoch replay) would
  * silently clobber the first app's data. The batch commit therefore
  * prefixes published names with a query-unique token; this spec
  * drives `SinkCommit.publish` directly with colliding staged names
  * (same package — the protocol internals are package-private).
  */
class SinkPublishSpec extends AnyFunSuite {

  test("a merge-on-read delete landing after the rewrite's scan aborts the commit") {
    val root = Files.createTempDirectory("sink_mor_conflict").toString
    val fs = FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    assert(SinkVersions.tryWrite(fs, root, 1L,
      Seq(("p=A/f1.tsv", Seq("A")), ("p=A/f2.tsv", Seq("A")))))
    // our rewrite READ f1 at v1 (no delete manifests active); a
    // concurrent MOR delete then landed positions in f1 as v2
    SinkDeletes.write(fs, root, "del-race.tsv", Seq(("p=A/f1.tsv", 0L)))
    assert(SinkVersions.tryWrite(fs, root, 2L,
      Seq(("p=A/f1.tsv", Seq("A")), ("p=A/f2.tsv", Seq("A"))),
      dels = Seq("del-race.tsv")))
    // f1 is still live, so the retired-files check alone would pass —
    // the read-snapshot guard must catch the unseen manifest
    val ex = intercept[java.util.ConcurrentModificationException] {
      SinkCommit.replaceCommit(fs, root, Seq("p"),
        fresh = Seq.empty, retiredSeq = Seq("p=A/f1.tsv"),
        readSnapshot = Some(SinkReadSnapshot(
          scanDels = Set.empty, readRels = Set("p=A/f1.tsv"))))
    }
    assert(ex.getMessage.contains("del-race.tsv"))
    // a rewrite whose SCAN already saw the manifest (and anti-filtered
    // through it) commits fine
    SinkCommit.replaceCommit(fs, root, Seq("p"),
      fresh = Seq.empty, retiredSeq = Seq("p=A/f1.tsv"),
      readSnapshot = Some(SinkReadSnapshot(
        scanDels = Set("del-race.tsv"), readRels = Set("p=A/f1.tsv"))))
    assert(SinkVersions.read(fs, root, 3L).map(_._1) === Seq("p=A/f2.tsv"))
    // and one reading OTHER files than the manifest touches is no
    // conflict either
    SinkDeletes.write(fs, root, "del-other.tsv", Seq(("p=A/f9.tsv", 4L)))
    assert(SinkVersions.tryWrite(fs, root, 4L,
      Seq(("p=A/f2.tsv", Seq("A")), ("p=A/f9.tsv", Seq("A"))),
      dels = Seq("del-other.tsv")))
    SinkCommit.replaceCommit(fs, root, Seq("p"),
      fresh = Seq.empty, retiredSeq = Seq("p=A/f2.tsv"),
      readSnapshot = Some(SinkReadSnapshot(
        scanDels = Set.empty, readRels = Set("p=A/f2.tsv"))))
  }

  test("commit-time GC drops position manifests whose every target file retired") {
    val root = Files.createTempDirectory("sink_del_gc").toString
    val fs = FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    SinkDeletes.write(fs, root, "del-f1.tsv", Seq(("p=A/f1.tsv", 0L)))
    SinkDeletes.write(fs, root, "del-f2.tsv", Seq(("p=A/f2.tsv", 7L)))
    assert(SinkVersions.tryWrite(fs, root, 1L,
      Seq(("p=A/f1.tsv", Seq("A")), ("p=A/f2.tsv", Seq("A"))),
      dels = Seq("del-f1.tsv", "del-f2.tsv")))
    // a COW rewrite retires f1 (folding del-f1's positions in): the
    // carried manifest list must drop del-f1 — nothing it touches
    // survives — and keep del-f2, whose file lives on
    SinkCommit.replaceCommit(fs, root, Seq("p"),
      fresh = Seq(("p=A/f1b.tsv", Seq("A"))), retiredSeq = Seq("p=A/f1.tsv"),
      readSnapshot = Some(SinkReadSnapshot(
        scanDels = Set("del-f1.tsv", "del-f2.tsv"),
        readRels = Set("p=A/f1.tsv"))))
    assert(SinkVersions.readDeletes(fs, root, 2L) === Seq("del-f2.tsv"),
      "fully-folded manifests must GC out of the headers")
    // the ordinary publish path GCs the same way (here: a truncate-free
    // dynamic-style commit that retires f2 via the replace path)
    SinkCommit.replaceCommit(fs, root, Seq("p"),
      fresh = Seq.empty, retiredSeq = Seq("p=A/f2.tsv"))
    assert(SinkVersions.readDeletes(fs, root, 3L) === Seq.empty,
      "the last manifest retires with its file")
  }

  test("streaming tail skips provably-excluded files when filters are pushed") {
    // Spark's streaming planner does NOT run V2ScanRelationPushDown
    // (it is batch-only), so a `.filter` above readStream.table never
    // reaches pushFilters — drive the scan-builder protocol directly,
    // exactly as a pushing planner would, and pin that the tail plans
    // only the file whose recorded min/max intersects the predicate
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("sink_stail").toString
    spark.conf.set("spark.sql.catalog.graft_st_spec",
      classOf[PartitionedSinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_st_spec.root", root)
    def batch(ks: Seq[Long]) = ks.map(k => (k, "A")).toDF("k", "p").coalesce(1)
    batch(1L to 10L)
      .writeTo("graft_st_spec.t").partitionedBy(col("p")).create()
    batch(11L to 20L).writeTo("graft_st_spec.t").append()
    batch(21L to 30L).writeTo("graft_st_spec.t").append()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType)))
    def ckpt(n: String) = Files.createTempDirectory(n).toString
    val builder = new PartitionedSinkScanBuilder(s"$root/t", Seq("p"), schema)
    val residual = builder.pushFilters(
      Array(org.apache.spark.sql.sources.GreaterThan("k", 25L)))
    assert(residual.length === 1,
      "skip filters stay residual — the engine re-evaluates post-scan")
    val stream = builder.build().toMicroBatchStream(ckpt("stail_ck"))
    val splits = stream.planInputPartitions(
      stream.initialOffset(), stream.latestOffset())
    assert(splits.length === 1,
      s"two band files must be SKIPPED at tail planning, " +
        s"got ${splits.length} splits")
    // the unfiltered tail plans all three
    val b2 = new PartitionedSinkScanBuilder(s"$root/t", Seq("p"), schema)
    val s2 = b2.build().toMicroBatchStream(ckpt("stail_ck2"))
    assert(s2.planInputPartitions(s2.initialOffset(), s2.latestOffset())
      .length === 3)
    // and a giant epoch file carves into byte ranges on the tail too —
    // rows exactly once across the ranges (batch-twin read compares)
    spark.conf.set("spark.graft.sink.maxSplitBytes", "16")
    try {
      val b3 = new PartitionedSinkScanBuilder(s"$root/t", Seq("p"), schema)
      val s3 = b3.build().toMicroBatchStream(ckpt("stail_ck3"))
      val ranges = s3.planInputPartitions(s3.initialOffset(), s3.latestOffset())
      assert(ranges.length > 3,
        s"16-byte threshold must carve the tail's files, got ${ranges.length}")
      val factory = b3.build().toMicroBatchStream(ckpt("stail_ck4"))
        .createReaderFactory()
      val rows = ranges.flatMap { sp =>
        val r = factory.createReader(sp)
        val buf = scala.collection.mutable.ArrayBuffer[Long]()
        while (r.next()) buf += r.get().getLong(0)
        r.close(); buf
      }
      assert(rows.sorted.toSeq === (1L to 30L),
        "ranged tail reads every row exactly once")
    } finally spark.conf.unset("spark.graft.sink.maxSplitBytes")
    spark.sql("DROP TABLE graft_st_spec.t")
  }

  test("legacy (pre-r15) array offsets absorb into the generation log: exact deltas, no duplicates, no loss") {
    // a pre-r15 checkpoint's offsets are flat JSON arrays of every file
    // ever emitted; the generation encoding must ABSORB one on first
    // deserialize (unseen files become the next generation) and plan
    // mixed legacy/generation batches as exact set deltas — an operator
    // upgrading in place neither replays the whole table nor loses the
    // files published between the old run's last offset and the upgrade
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("sink_legacy").toString
    spark.conf.set("spark.sql.catalog.graft_lg_spec",
      classOf[PartitionedSinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_lg_spec.root", root)
    def batch(ks: Seq[Long]) = ks.map(k => (k, "A")).toDF("k", "p").coalesce(1)
    // a table with a pre-r15 checkpoint is by definition a TSV-era
    // table (and the file ordering below reads the one-row files as
    // text) — pin the legacy format explicitly
    batch(Seq(1L)).writeTo("graft_lg_spec.t")
      .tableProperty("graft.format", "tsv")
      .partitionedBy(col("p")).create()
    batch(Seq(2L)).writeTo("graft_lg_spec.t").append()
    batch(Seq(3L)).writeTo("graft_lg_spec.t").append()
    val fs = FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    // the three published files in ROW order (batch file names carry a
    // random query token, so lexicographic path order is meaningless —
    // order by each one-row file's k value instead), rendered the way
    // the tail renders paths
    val files = fs.listStatus(new Path(s"$root/t/p=A"))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map { s =>
        val in = fs.open(s.getPath)
        val k = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim.toLong
        finally in.close()
        (k, s.getPath.toString)
      }.sortBy(_._1).map(_._2).toSeq
    assert(files.length === 3)
    def legacyJson(fl: Seq[String]) =
      fl.map(f => "\"" + f.replace("\\", "\\\\") + "\"")
        .mkString("[", ",", "]")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType)))
    val ckpt = Files.createTempDirectory("legacy_ck").toString
    def stream() = new PartitionedSinkScanBuilder(s"$root/t", Seq("p"), schema)
      .build().toMicroBatchStream(ckpt)
    val s1 = stream()
    def rowsOf(splits: Array[org.apache.spark.sql.connector.read.InputPartition],
               st: org.apache.spark.sql.connector.read.streaming.MicroBatchStream)
        : Seq[Long] = {
      val factory = st.createReaderFactory()
      splits.toSeq.flatMap { sp =>
        val r = factory.createReader(sp)
        val buf = scala.collection.mutable.ArrayBuffer[Long]()
        while (r.next()) buf += r.get().getLong(0)
        r.close(); buf
      }
    }
    // the old checkpoint committed through file 2; files absorb as gen 1
    val start = s1.deserializeOffset(legacyJson(files.take(2)))
    val end = s1.latestOffset()
    val delta = s1.planInputPartitions(start, end)
    assert(rowsOf(delta, s1).sorted === Seq(3L),
      "the (legacy, latest) batch must emit exactly the post-upgrade file")
    // an uncommitted legacy batch replays as a legacy/legacy pair —
    // still an exact delta, whatever grain the absorb landed in
    val s2 = stream()
    val lStart = s2.deserializeOffset(legacyJson(files.take(1)))
    val lEnd = s2.deserializeOffset(legacyJson(files.take(2)))
    assert(rowsOf(s2.planInputPartitions(lStart, lEnd), s2).sorted === Seq(2L),
      "a replayed legacy batch emits exactly its old delta")
    // a RESTART on the migrated checkpoint rebuilds the seen set from
    // the absorbed logs: nothing is re-logged, and a from-scratch read
    // of the full range still sees every row exactly once
    val s3 = stream()
    val full = s3.planInputPartitions(s3.initialOffset(), s3.latestOffset())
    assert(rowsOf(full, s3).sorted === Seq(1L, 2L, 3L),
      "absorbed + fresh generations cover the table exactly once")
    spark.sql("DROP TABLE graft_lg_spec.t")
  }

  test("same-named staged files from two driver JVMs both survive publish") {
    val root = Files.createTempDirectory("sink_pub").toString
    val fs = FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())

    // both "applications" stage part-0-0-A.tsv (fresh JVM ⇒ taskId 0)
    def stage(queryId: String, content: String): StagedFile = {
      val p = new Path(s"$root/_staging/$queryId/part-0-0-A.tsv")
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      StagedFile(Seq("A"), p.toString, 1, 0)
    }
    // mirror PartitionedSinkBatchWrite.commit's naming exactly
    def publishAs(queryId: String, f: StagedFile): Unit = {
      val qTok = queryId.replaceAll("[^0-9a-zA-Z]", "").take(8)
      SinkCommit.publish(fs, root, Seq("p"), Append, Seq(f),
        sf => s"part-$qTok-" +
          new Path(sf.stagedPath).getName.stripPrefix("part-"),
        statsToken = queryId)
    }
    publishAs("query-one-uuid", stage("query-one-uuid", "1\t1.0\n"))
    publishAs("query-two-uuid", stage("query-two-uuid", "2\t2.0\n"))

    val dataFiles = fs.listStatus(new Path(s"$root/p=A"))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    assert(dataFiles.length === 2,
      "the second app's same-named staged file must publish alongside " +
        "the first's, not over it")
    val contents = dataFiles.map { s =>
      val in = fs.open(s.getPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }.toSet
    assert(contents === Set("1\t1.0\n", "2\t2.0\n"),
      "both appends' rows survive byte-exactly")
  }

  test("version manifest commit is compare-and-swap: a taken version number is rejected, not replaced") {
    val root = Files.createTempDirectory("sink_cas").toString
    val fs = FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    assert(SinkVersions.tryWrite(fs, root, 1L, Seq(("p=A/f1.tsv", Seq("A")))),
      "first writer claims version 1")
    // a racing publisher computed the same next version from the same
    // base — its commit must FAIL (plain FileSystem.rename on a local
    // FS would silently replace the file and lose the first snapshot)
    assert(!SinkVersions.tryWrite(fs, root, 1L, Seq(("p=B/f2.tsv", Seq("B")))),
      "second writer's CAS on the taken version must lose")
    assert(SinkVersions.read(fs, root, 1L) === Seq(("p=A/f1.tsv", Seq("A"))),
      "the winning snapshot is untouched")
    assert(SinkVersions.tryWrite(fs, root, 2L, Seq(("p=B/f2.tsv", Seq("B")))),
      "the loser retries at the next number and lands")
    assert(SinkVersions.latest(fs, root) === Some(2L))
  }

  test("row-level replace conflict-detects: a retired file already replaced by a concurrent commit aborts") {
    val root = Files.createTempDirectory("sink_rl_conflict").toString
    val fs = FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    // snapshot 1 holds f1; a "concurrent" rewrite replaced it in
    // snapshot 2 with f2 — our rewrite ALSO read f1, so its kept-rows
    // are stale: the commit must abort, not silently co-publish both
    // rewrites' carried-forward copies of f1's rows
    assert(SinkVersions.tryWrite(fs, root, 1L, Seq(("p=A/f1.tsv", Seq("A")))))
    assert(SinkVersions.tryWrite(fs, root, 2L, Seq(("p=A/f2.tsv", Seq("A")))))
    val ex = intercept[java.util.ConcurrentModificationException] {
      SinkCommit.replacePublish(fs, root, Seq("p"), files = Seq.empty,
        replaced = Seq(("p=A/f1.tsv", Seq("A"), s"$root/p=A/f1.tsv")),
        destName = _ => "", statsToken = "t", versioned = true)
    }
    assert(ex.getMessage.contains("f1.tsv"))
    // a retire of a file that IS live commits: pure-delete rewrite
    SinkCommit.replacePublish(fs, root, Seq("p"), files = Seq.empty,
      replaced = Seq(("p=A/f2.tsv", Seq("A"), s"$root/p=A/f2.tsv")),
      destName = _ => "", statsToken = "t", versioned = true)
    assert(SinkVersions.read(fs, root, 3L) === Seq.empty)
  }
}
