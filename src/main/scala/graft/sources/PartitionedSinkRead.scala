package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** READ half of the partitioned sink's catalog tables: `SELECT ... FROM
  * cat.t` / `spark.table("cat.t")` scan the hive-style TSV layout
  * directly, with the two pushdowns that matter for this layout shape:
  *
  *   - PARTITION PRUNING ([[SupportsPushDownFilters]]): `partCol = v`,
  *     `partCol IN (...)` and `IsNotNull(partCol)` are consumed at
  *     planning time — pruned partitions contribute ZERO input splits,
  *     which at warehouse scale is the difference between scanning a
  *     day and scanning a decade. Data-column predicates are declined
  *     (returned as post-scan filters) — a text layout has no
  *     row-group statistics to prune with.
  *   - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the
  *     reader still splits every line (a TSV row must be walked to be
  *     skipped) but only DECODES and materializes requested fields;
  *     the partition column costs nothing (it comes from the dir
  *     name, one constant per split).
  *
  * One [[InputPartition]] per data FILE — the natural split grain of
  * the layout (files are per-(task, partition-value) from the write
  * side, so sizes track write parallelism). Executors get the session
  * Hadoop conf the same way the writer does.
  */
private[sources] class PartitionedSinkScanBuilder(
    path: String, partCol: String, fullSchema: StructType,
    asOfVersion: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var partitionFilters: Array[Filter] = Array.empty
  private var skipFilters: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // a NULL inside the comparison (isin(lit(null), ...) / === null)
    // never matches a partition dir and its rendering is undefined —
    // decline pushdown and leave such filters entirely to Spark
    val pushable = filters.filter {
      case EqualTo(c, v) => c == partCol && v != null
      case In(c, vs) => c == partCol && vs != null && !vs.contains(null)
      case IsNotNull(c) => c == partCol // partition values are never null
      case _ => false
    }
    partitionFilters = pushable
    // DATA-column comparisons become FILE-SKIP candidates against the
    // per-file min/max manifests the write side publishes (SinkStats):
    // a file whose recorded range provably excludes the predicate
    // contributes zero splits — the row-group pruning a Parquet lake
    // gets from footers, recovered for the text layout
    skipFilters = filters.filter {
      case GreaterThan(c, _) => c != partCol
      case GreaterThanOrEqual(c, _) => c != partCol
      case LessThan(c, _) => c != partCol
      case LessThanOrEqual(c, _) => c != partCol
      case EqualTo(c, v) => c != partCol && v != null
      case In(c, vs) => c != partCol && vs != null && !vs.contains(null)
      case _ => false
    }
    // ALL filters stay residual: pruning only SKIPS dirs/files whose
    // rendered value or recorded range provably fails the predicate —
    // Spark re-evaluates post-scan, so a value whose Catalyst string
    // form differs from the writer's raw rendering can at worst read
    // extra files, never return wrong rows
    filters
  }
  override def pushedFilters(): Array[Filter] =
    partitionFilters ++ skipFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the table's field order (the line decoder walks by ordinal)
    required = StructType(
      fullSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    new PartitionedSinkScan(path, partCol, fullSchema, required,
      partitionFilters, skipFilters, asOfVersion)
}

private class PartitionedSinkScan(
    path: String, partCol: String, fullSchema: StructType,
    required: StructType, partitionFilters: Array[Filter],
    skipFilters: Array[Filter] = Array.empty,
    asOfVersion: Option[Long] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PartitionedSinkScan($path)" +
      asOfVersion.map(v => s" VERSION AS OF $v").getOrElse("") +
      " PushedPartitionFilters: " +
      partitionFilters.mkString("[", ", ", "]") +
      " FileSkipFilters: " + skipFilters.mkString("[", ", ", "]")

  private def keepValue(v: String): Boolean = partitionFilters.forall {
    case EqualTo(_, want) => v == want.toString
    case In(_, vs) => vs.exists(w => v == w.toString)
    case IsNotNull(_) => true
    case _ => true
  }

  /** (value, file, recorded rows) for every partition SURVIVING the
    * pushed filters — shared by split planning and statistics, so both
    * see the same pruned view. Membership comes from the directory
    * listing, or — on a VERSIONED table — from the snapshot manifest
    * (the requested `VERSION AS OF`, else the latest), which is what
    * makes logically retired files invisible without physical deletes.
    */
  private lazy val prunedFilesWithStats
      : Seq[(String, org.apache.hadoop.fs.FileStatus, Option[Long])] = {
    val fs = FileSystem.get(new java.net.URI(path),
      SparkSession.active.sessionState.newHadoopConf())
    val root = new Path(path)
    if (!fs.exists(root)) Seq.empty
    else {
      val version = asOfVersion.orElse(
        if (SinkVersions.isVersioned(fs, path))
          SinkVersions.latest(fs, path)
        else None)
      // (value, data file) after partition pruning, before file skipping
      val candidates: Seq[(String, org.apache.hadoop.fs.FileStatus)] =
        version match {
          case Some(v) =>
            SinkVersions.read(fs, path, v)
              .filter { case (_, value) => keepValue(value) }
              .map { case (rel, value) =>
                val p = new Path(path, rel)
                if (!fs.exists(p)) throw new IllegalStateException(
                  s"version $v of $path references $rel, which no longer " +
                    "exists — vacuumed beyond retention?")
                value -> fs.getFileStatus(p)
              }
          case None =>
            fs.listStatus(root).toSeq
              .filter(s => s.isDirectory &&
                s.getPath.getName.startsWith(partCol + "="))
              .map(s => TsvCodec.unescapeDir(
                s.getPath.getName.stripPrefix(partCol + "=")) -> s.getPath)
              .filter { case (v, _) => keepValue(v) } // partition pruning
              .flatMap { case (v, dir) =>
                fs.listStatus(dir)
                  .filter(f => f.isFile &&
                    !f.getPath.getName.startsWith(".") &&
                    !f.getPath.getName.startsWith("_")) // no markers
                  .map(v -> _)
              }
        }
      // per-dir stats manifests (driver-side, small — one per publish
      // per dir): used for FILE SKIPPING (drop every file whose
      // recorded min/max provably excludes a skip filter; files
      // without stats are always kept) and for the exact ROW COUNTS
      // estimateStatistics reports. Loaded once per dir per scan.
      candidates.groupBy(_._2.getPath.getParent).toSeq
        .flatMap { case (dir, inDir) =>
          val stats = SinkStats.readDir(fs, dir)
          inDir.flatMap { case (v, f) =>
            val st = stats.get(f.getPath.getName)
            val keep = st.forall(s =>
              skipFilters.forall(SinkFileSkip.mayMatch(_, s.cols)))
            if (keep) Some((v, f, st.flatMap(_.rows))) else None
          }
        }
    }
  }

  private lazy val prunedFiles
      : Seq[(String, org.apache.hadoop.fs.FileStatus)] =
    prunedFilesWithStats.map(t => (t._1, t._2))

  /** Byte-range split carving: a scan that cannot split a 10 GB file
    * is one task at 100 TB. The TSV codec escapes \n and \r inside
    * values, so every ROW is one physical LINE and the classic
    * LineRecordReader contract applies — split i reads the lines whose
    * first byte lies in (start_i, end_i] (the first split from 0), a
    * line crossing the boundary is finished by the split that started
    * it, and every split with start > 0 discards its first (possibly
    * partial) line. Files at or under the threshold stay whole.
    */
  private lazy val inputSplits: Array[InputPartition] = {
    val sess = SparkSession.active
    val maxSplit = sess.conf.getOption("spark.graft.sink.maxSplitBytes")
      .map(_.toLong)
      .getOrElse(sess.sessionState.conf.filesMaxPartitionBytes)
      .max(1L)
    prunedFiles.flatMap { case (v, f) =>
      val len = f.getLen
      if (len <= maxSplit)
        Seq(SinkFileSplit(f.getPath.toString, v,
          fullSchema(partCol).dataType): InputPartition)
      else (0L until len by maxSplit).map(s =>
        SinkFileSplit(f.getPath.toString, v, fullSchema(partCol).dataType,
          s, math.min(maxSplit, len - s)): InputPartition)
    }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = inputSplits

  private lazy val carved: Boolean = inputSplits.length > prunedFiles.size

  /** POST-PRUNING statistics: `partCol = v` reports only v's bytes,
    * so a query over one partition of a huge table is
    * auto-broadcastable even though the whole table is not — exactly
    * the estimate Catalyst's join planning consumes
    * (V2ScanRelationPushDown folds it into the relation stats). Row
    * counts come EXACT from the publish manifests (each writer counted
    * its rows); reported only when every surviving file recorded one —
    * a partial sum would mislead the CBO worse than no estimate.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(prunedFiles.map(_._2.getLen).sum)
      override def numRows(): java.util.OptionalLong =
        if (prunedFilesWithStats.nonEmpty &&
            prunedFilesWithStats.forall(_._3.isDefined))
          java.util.OptionalLong.of(prunedFilesWithStats.flatMap(_._3).sum)
        else if (prunedFilesWithStats.isEmpty)
          java.util.OptionalLong.of(0L)
        else java.util.OptionalLong.empty()
    }

  /** STORAGE-PARTITIONED execution: the layout IS hash-free clustered
    * on the partition column, and saying so (KeyGroupedPartitioning +
    * per-split [[SinkFileSplit.partitionKey]]) lets Catalyst satisfy a
    * ClusteredDistribution(partCol) straight from the files — a
    * `GROUP BY partCol` or a storage-partitioned join on it plans ZERO
    * exchanges (requires `spark.sql.sources.v2.bucketing.enabled`,
    * on in GraftSession). At warehouse scale that removes the shuffle
    * from exactly the queries a partitioned table exists to serve.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    // key-grouped execution collapses each VALUE's splits into one
    // task — exactly right when a value is a handful of files (zero-
    // exchange GROUP BY / joins), exactly wrong once a file was carved
    // into byte ranges for parallelism: grouping would re-serialize
    // the ranges. Report the clustering only when nothing was carved.
    if (carved)
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
        inputSplits.length)
    else
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity(partCol)),
        prunedFiles.map(_._1).distinct.size)

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionedSinkReaderFactory(fullSchema, required, partCol,
      PartitionedSinkWriterFactory.sessionConf())

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PartitionedSinkMicroBatchStream(path, partCol, fullSchema, required,
      partitionFilters, keepValue, checkpointLocation, skipFilters)
}

/** Streaming READ of a sink table — `spark.readStream.table("cat.t")`
  * tails the layout with the seen-map + batch-log design of Spark's
  * own FileStreamSource: the OFFSET is a single generation number
  * (constant-size JSON, independent of table file count), and the
  * files of each generation live in an immutable per-generation log
  * under the source's checkpoint directory. `latestOffset` lists the
  * layout (the sink's commit protocol makes publication atomic, so a
  * listing never sees a half-written file), diffs against the seen
  * set, and — when new files exist — writes them as log entry
  * `<gen+1>` (atomic tmp+rename). A micro-batch (s, e] is the union of
  * log entries s+1..e — deterministic under replay: the same offsets
  * always read the same immutable logs, across restarts too (the seen
  * set and max generation are rebuilt from the logs on construction).
  * The old encoding carried the ENTIRE published-file list in every
  * offset — O(files) checkpoint growth per trigger, the driver-side
  * bottleneck class this repo eliminates elsewhere; a pre-r15
  * checkpoint (array-form offset) is not readable by this encoding.
  * Append-only semantics — files removed by a dynamic overwrite after
  * being logged are skipped at planning (already-emitted rows are NOT
  * retracted; a reader of a table being rewritten wants a CDC log, not
  * a file tail). Pushed partition filters drop pruned values' files
  * at listing AND planning time, and pushed data-column comparisons
  * skip provably-excluded files at planning (same residual contract
  * as the batch scan) — with the honest caveat that Spark's streaming
  * planner does not run V2ScanRelationPushDown, so `.filter` above
  * `readStream.table` reaches neither hook today; they fire when the
  * builder is driven through the pushdown protocol directly
  * (spec-pinned), and the full stream stays correct either way
  * because every filter is also evaluated post-scan.
  */
private class PartitionedSinkMicroBatchStream(
    path: String, partCol: String, fullSchema: StructType,
    required: StructType, partitionFilters: Array[Filter],
    keepValue: String => Boolean, checkpointLocation: String,
    skipFilters: Array[Filter] = Array.empty)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class GenOffset(gen: Long) extends Offset {
    override def json(): String = s"""{"gen":$gen}"""
  }

  private def fs: FileSystem = FileSystem.get(new java.net.URI(path),
    SparkSession.active.sessionState.newHadoopConf())

  private val logDir = new Path(checkpointLocation, "graft-file-log")

  // rebuilt from the immutable logs on (re)construction — a restart
  // resumes with the exact seen set the previous run had logged
  private lazy val state: (scala.collection.mutable.Set[String],
                           java.util.concurrent.atomic.AtomicLong) = {
    val f = fs
    val seen = scala.collection.mutable.Set[String]()
    var maxGen = 0L
    if (f.exists(logDir)) {
      Option(f.listStatus(logDir)).toSeq.flatten
        .filter(s => s.isFile && s.getPath.getName.forall(_.isDigit))
        .foreach { s =>
          maxGen = math.max(maxGen, s.getPath.getName.toLong)
          readLog(f, s.getPath).foreach { case (file, _) => seen += file }
        }
    }
    (seen, new java.util.concurrent.atomic.AtomicLong(maxGen))
  }

  private def readLog(f: FileSystem, p: Path): Seq[(String, String)] = {
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
      line.split("\t", -1) match {
        case Array(file, v) =>
          Some((TsvCodec.unescape(UTF8String.fromString(file)).toString,
            TsvCodec.unescape(UTF8String.fromString(v)).toString))
        case _ => None
      }
    }
  }

  private def writeLog(f: FileSystem, gen: Long,
                       files: Seq[(String, String)]): Unit = {
    f.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-$gen-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(files.map { case (file, v) =>
      s"${TsvCodec.escape(file)}\t${TsvCodec.escape(v)}"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new Path(logDir, gen.toString)))
      throw new java.io.IOException(s"file-log commit failed for gen $gen")
  }

  private def listFiles(): Seq[(String, String)] = {
    val f = fs
    val root = new Path(path)
    if (!f.exists(root)) Seq.empty
    // VERSIONED table: live membership is the latest snapshot manifest
    // (logically retired files must not re-enter the tail)
    else if (SinkVersions.isVersioned(f, path))
      SinkVersions.latest(f, path).toSeq
        .flatMap(SinkVersions.read(f, path, _))
        .filter { case (_, v) => keepValue(v) }
        .map { case (rel, v) => new Path(path, rel).toString -> v }
        .sortBy(_._1)
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map(s => TsvCodec.unescapeDir(
        s.getPath.getName.stripPrefix(partCol + "=")) -> s.getPath)
      .filter { case (v, _) => keepValue(v) }
      .flatMap { case (v, dir) =>
        f.listStatus(dir)
          .filter(fl => fl.isFile && !fl.getPath.getName.startsWith(".") &&
            !fl.getPath.getName.startsWith("_"))
          .map(fl => fl.getPath.toString -> v)
      }
      .sortBy(_._1)
  }

  override def initialOffset(): Offset = GenOffset(0L)

  override def latestOffset(): Offset = {
    val (seen, maxGen) = state
    val fresh = listFiles().filterNot { case (file, _) => seen(file) }
    if (fresh.nonEmpty) {
      val gen = maxGen.incrementAndGet()
      writeLog(fs, gen, fresh)
      fresh.foreach { case (file, _) => seen += file }
    }
    GenOffset(maxGen.get())
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """\{\s*"gen"\s*:\s*(\d+)\s*\}""".r
    json.trim match {
      case m(g) => GenOffset(g.toLong)
      case _ => throw new IllegalStateException(
        s"unreadable sink-stream offset '$json' — pre-r15 (file-list) " +
          "checkpoints are not supported by the generation-log encoding; " +
          "restart the query with a fresh checkpoint")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[GenOffset].gen
    val e = end.asInstanceOf[GenOffset].gen
    val f = fs
    val live = (s + 1 to e).flatMap { g =>
      val p = new Path(logDir, g.toString)
      if (!f.exists(p)) Seq.empty else readLog(f, p)
    }
      .filter { case (file, v) => keepValue(v) && f.exists(new Path(file)) }
    // FILE SKIPPING on the tail, same contract as the batch scan: the
    // query's data-column comparisons stay residual, so dropping a
    // provably-excluded file removes only rows the filter would
    // discard anyway — a replay without stats (vacuumed manifests)
    // reads the file and post-scan-filters to the identical output
    val kept =
      if (skipFilters.isEmpty) live
      else live.groupBy(t => new Path(t._1).getParent).toSeq
        .flatMap { case (dir, inDir) =>
          val stats = SinkStats.readDir(f, dir)
          inDir.filter { case (file, _) =>
            stats.get(new Path(file).getName)
              .forall(st => skipFilters.forall(
                SinkFileSkip.mayMatch(_, st.cols)))
          }
        }
    // byte-range carving, same contract as the batch scan: a giant
    // epoch file must not become one task. Deterministic under replay
    // because published files are immutable — the same file always
    // carves into the same ranges
    val sess = SparkSession.active
    val maxSplit = sess.conf.getOption("spark.graft.sink.maxSplitBytes")
      .map(_.toLong)
      .getOrElse(sess.sessionState.conf.filesMaxPartitionBytes)
      .max(1L)
    kept.sortBy(_._1)
      .flatMap { case (file, v) =>
        val len = f.getFileStatus(new Path(file)).getLen
        if (len <= maxSplit)
          Seq(SinkFileSplit(file, v,
            fullSchema(partCol).dataType): InputPartition)
        else (0L until len by maxSplit).map(s =>
          SinkFileSplit(file, v, fullSchema(partCol).dataType,
            s, math.min(maxSplit, len - s)): InputPartition)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionedSinkReaderFactory(fullSchema, required, partCol,
      PartitionedSinkWriterFactory.sessionConf())

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One scan task: a whole file (default) or a byte range of one.
  * `length = Long.MaxValue` means "through end of file" — the reader
  * clamps to the actual file length with saturating arithmetic.
  */
private case class SinkFileSplit(file: String, partValue: String,
                                 keyType: DataType,
                                 start: Long = 0L,
                                 length: Long = Long.MaxValue)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(PartitionedSinkReader.castValue(partValue, keyType))
}

private class PartitionedSinkReaderFactory(
    fullSchema: StructType, required: StructType, partCol: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(split: InputPartition): PartitionReader[InternalRow] =
    new PartitionedSinkReader(split.asInstanceOf[SinkFileSplit],
      fullSchema, required, partCol, conf)
}

/** Line reader for one staged-then-published TSV file: split on tab,
  * decode only the REQUIRED ordinals (TsvCodec unescape for strings,
  * straight parses for numerics, `\N` → null), fill the partition
  * column from the split's constant.
  */
private class PartitionedSinkReader(
    split: SinkFileSplit, fullSchema: StructType, required: StructType,
    partCol: String, conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  // Path(...).toUri, not new URI(...): the file name embeds the escaped
  // partition VALUE, which hive escaping leaves spaces (and other
  // URI-illegal chars) in — Path percent-encodes them, a raw URI throws
  private val fs = FileSystem.get(new Path(split.file).toUri, conf.value)

  // Ranged read, LineRecordReader contract: emit the lines whose FIRST
  // byte position is ≤ end (INCLUSIVE — a line starting exactly at the
  // boundary belongs to THIS split; the next split's discard-first
  // throws its copy away), finish a line that crosses the boundary,
  // and when start > 0 discard the first (possibly partial) line — the
  // previous split finished it. Sound for UTF-8 because '\n' bytes
  // cannot occur inside a multi-byte character, and sound for the
  // layout because TsvCodec escapes \n/\r inside values.
  private val stream = fs.open(new Path(split.file))
  private val end: Long = {
    val len = fs.getFileStatus(new Path(split.file)).getLen
    if (split.length >= len - split.start) len // saturating: MaxValue ok
    else split.start + split.length
  }
  private var pos: Long = split.start
  private val lineReader = {
    if (split.start > 0) stream.seek(split.start)
    val lr = new org.apache.hadoop.util.LineReader(stream, conf.value)
    if (split.start > 0)
      pos += lr.readLine(new org.apache.hadoop.io.Text) // discard-first
    lr
  }
  private val text = new org.apache.hadoop.io.Text

  // the file carries the data fields in fullSchema order MINUS partCol
  private val dataFields =
    fullSchema.fields.filter(_.name != partCol)
  // required ordinal -> (file column index | -1 for the partition col)
  private val plan: Array[(Int, DataType)] = required.fields.map { f =>
    if (f.name == partCol) (-1, f.dataType)
    else (dataFields.indexWhere(_.name == f.name), f.dataType)
  }
  // column pruning, for real: the walk below materializes a String for
  // REQUIRED cells only and stops at the last one — a 2-column
  // projection of a 50-column row never scans past its cells, and a
  // partition-column-only read (count(*) over p) never walks the line
  // at all. `java.lang.String.split` would allocate every cell of
  // every row regardless of the projection.
  private val maxNeeded: Int =
    if (plan.exists(_._1 >= 0)) plan.map(_._1).max else -1
  private val neededCell: Array[Boolean] = {
    val a = new Array[Boolean](maxNeeded + 1)
    plan.foreach { case (i, _) => if (i >= 0) a(i) = true }
    a
  }
  private val partValue: Any =
    PartitionedSinkReader.castValue(split.partValue, fullSchema(partCol).dataType)

  private def cast(s: String, dt: DataType): Any =
    PartitionedSinkReader.castValue(s, dt)

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (pos > end) return false // next line starts past this range
    val n = lineReader.readLine(text)
    if (n == 0) return false // end of file
    pos += n
    val line = new String(text.getBytes, 0, text.getLength, "UTF-8")
    // one pass, required cells only, stop after the last needed one.
    // End-of-line terminates the final cell (split("\t", -1) parity:
    // trailing empty cells — a NULL in the last column — survive)
    val cells = new Array[String](maxNeeded + 1)
    var cellIdx = 0
    var cellStart = 0
    var i = 0
    while (cellIdx <= maxNeeded && i <= line.length) {
      if (i == line.length || line.charAt(i) == '\t') {
        if (neededCell(cellIdx))
          cells(cellIdx) = line.substring(cellStart, i)
        cellIdx += 1
        cellStart = i + 1
      }
      i += 1
    }
    // cells actually present on the line, for SHORT-row detection (the
    // file predates an ADD COLUMNS evolution — missing trailing cells
    // read as NULL); when the walk stopped early every needed cell was
    // seen, so the count only matters when it is small
    val cellsSeen = cellIdx
    val values = plan.map { case (idx, dt) =>
      if (idx < 0) partValue
      else if (idx >= cellsSeen) null
      else {
        val cell = cells(idx)
        if (cell == PartitionedSink.NullToken) null
        else dt match {
          case StringType => UTF8String.fromString(
            TsvCodec.unescape(UTF8String.fromString(cell)).toString)
          case other => cast(cell, other)
        }
      }
    }
    current = InternalRow.fromSeq(values.toIndexedSeq)
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = { lineReader.close() }
}

/** Range evaluation for file skipping: decides whether a file MAY
  * contain a row matching a comparison filter, given the file's
  * per-column min/max (over non-null values). Conservative in every
  * uncertain direction — missing stats, unparseable bounds, or a
  * non-numeric literal all answer "may match" (scan the file). The one
  * aggressive-but-sound case: a column recorded ALL-NULL can never
  * satisfy a comparison (SQL: NULL cmp x is not true), so the file
  * skips for any of the handled predicates. Comparison is BigDecimal
  * (exact for every Long and for the round-tripped Double/Float
  * renderings the writer emits — no 2^53 float-widening trap).
  */
private[sources] object SinkFileSkip {
  private def big(s: String): Option[java.math.BigDecimal] =
    try Some(new java.math.BigDecimal(s))
    catch { case _: NumberFormatException => None }

  private def cmp(stats: Map[String, Option[(String, String)]], c: String,
                  v: Any)(
      sat: (java.math.BigDecimal, java.math.BigDecimal,
            java.math.BigDecimal) => Boolean): Boolean =
    stats.get(c) match {
      case None => true // no stats for the column: must scan
      case Some(None) => false // all values NULL: no comparison matches
      case Some(Some((mnS, mxS))) =>
        (big(mnS), big(mxS), Option(v).flatMap {
          case n: java.lang.Number => big(n.toString)
          case _ => None
        }) match {
          case (Some(mn), Some(mx), Some(b)) => sat(mn, mx, b)
          case _ => true
        }
    }

  /** false = the file provably contains no matching row. */
  def mayMatch(f: Filter,
               stats: Map[String, Option[(String, String)]]): Boolean =
    f match {
      case GreaterThan(c, v) => cmp(stats, c, v)((_, mx, b) => mx.compareTo(b) > 0)
      case GreaterThanOrEqual(c, v) => cmp(stats, c, v)((_, mx, b) => mx.compareTo(b) >= 0)
      case LessThan(c, v) => cmp(stats, c, v)((mn, _, b) => mn.compareTo(b) < 0)
      case LessThanOrEqual(c, v) => cmp(stats, c, v)((mn, _, b) => mn.compareTo(b) <= 0)
      case EqualTo(c, v) => cmp(stats, c, v)(
        (mn, mx, b) => mn.compareTo(b) <= 0 && mx.compareTo(b) >= 0)
      case In(c, vs) =>
        if (vs == null) true
        else vs.exists(v => cmp(stats, c, v)(
          (mn, mx, b) => mn.compareTo(b) <= 0 && mx.compareTo(b) >= 0))
      case _ => true
    }
}

private[sources] object PartitionedSinkReader {
  /** Text → Catalyst value for the sink's atomic type set. */
  def castValue(s: String, dt: DataType): Any = dt match {
    case StringType  => UTF8String.fromString(s)
    case LongType    => s.toLong
    case IntegerType => s.toInt
    case DoubleType  => s.toDouble
    case FloatType   => s.toFloat
    case BooleanType => s.toBoolean
    case ShortType   => s.toShort
    case ByteType    => s.toByte
    case other => throw new UnsupportedOperationException(
      s"PartitionedSink read supports atomic column types only, got $other")
  }
}
