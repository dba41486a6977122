package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
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
    path: String, partCol: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var partitionFilters: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushable, rest) = filters.partition {
      case EqualTo(c, _) => c == partCol
      case In(c, _) => c == partCol
      case IsNotNull(c) => c == partCol // partition values are never null
      case _ => false
    }
    partitionFilters = pushable
    rest
  }
  override def pushedFilters(): Array[Filter] = partitionFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the table's field order (the line decoder walks by ordinal)
    required = StructType(
      fullSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    new PartitionedSinkScan(path, partCol, fullSchema, required,
      partitionFilters)
}

private class PartitionedSinkScan(
    path: String, partCol: String, fullSchema: StructType,
    required: StructType, partitionFilters: Array[Filter])
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PartitionedSinkScan($path) PushedPartitionFilters: " +
      partitionFilters.mkString("[", ", ", "]")

  private def keepValue(v: String): Boolean = partitionFilters.forall {
    case EqualTo(_, want) => v == want.toString
    case In(_, vs) => vs.exists(w => v == w.toString)
    case IsNotNull(_) => true
    case _ => true
  }

  /** (value, files) for every partition SURVIVING the pushed filters —
    * shared by split planning and statistics, so both see the same
    * pruned view.
    */
  private lazy val prunedFiles
      : Seq[(String, org.apache.hadoop.fs.FileStatus)] = {
    val fs = FileSystem.get(new java.net.URI(path),
      SparkSession.active.sessionState.newHadoopConf())
    val root = new Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map(s => TsvCodec.unescapeDir(
        s.getPath.getName.stripPrefix(partCol + "=")) -> s.getPath)
      .filter { case (v, _) => keepValue(v) } // partition pruning
      .flatMap { case (v, dir) =>
        fs.listStatus(dir)
          .filter(f => f.isFile && !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_")) // no checksums/markers
          .map(v -> _)
      }
  }

  override def planInputPartitions(): Array[InputPartition] =
    prunedFiles.map { case (v, f) =>
      SinkFileSplit(f.getPath.toString, v,
        fullSchema(partCol).dataType): InputPartition
    }.toArray

  /** POST-PRUNING size statistics: `partCol = v` reports only v's
    * bytes, so a query over one partition of a huge table is
    * auto-broadcastable even though the whole table is not — exactly
    * the estimate Catalyst's join planning consumes
    * (V2ScanRelationPushDown folds it into the relation stats).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(prunedFiles.map(_._2.getLen).sum)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty() // text layout: rows unknown
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
      partitionFilters, keepValue)
}

/** Streaming READ of a sink table — `spark.readStream.table("cat.t")`
  * tails the layout: an offset is the sorted set of PUBLISHED data
  * files (the sink's commit protocol makes publication atomic, so a
  * listing never sees a half-written file), and a micro-batch is the
  * file-set delta between two offsets. Deterministic under replay: the
  * same (start, end) offsets always name the same files. Append-only
  * semantics — files removed by a dynamic overwrite simply leave the
  * listing (already-emitted rows are NOT retracted; a streaming reader
  * of a table being rewritten wants a CDC log, not a file tail — out
  * of scope and documented). Partition pruning applies to the tail:
  * pushed partition filters drop pruned values' files from every
  * offset. The offset carries the file list verbatim — right for
  * table-sized tails; a billion-file warehouse wants the seen-map +
  * compact-log design of Spark's FileStreamSource (noted, not needed
  * at this table's scale).
  */
private class PartitionedSinkMicroBatchStream(
    path: String, partCol: String, fullSchema: StructType,
    required: StructType, partitionFilters: Array[Filter],
    keepValue: String => Boolean)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class FilesOffset(files: Seq[String]) extends Offset {
    override def json(): String =
      files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
  }

  private def listFiles(): Seq[(String, String)] = {
    val fs = FileSystem.get(new java.net.URI(path),
      SparkSession.active.sessionState.newHadoopConf())
    val root = new Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map(s => TsvCodec.unescapeDir(
        s.getPath.getName.stripPrefix(partCol + "=")) -> s.getPath)
      .filter { case (v, _) => keepValue(v) }
      .flatMap { case (v, dir) =>
        fs.listStatus(dir)
          .filter(f => f.isFile && !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
          .map(f => f.getPath.toString -> v)
      }
      .sortBy(_._1)
  }

  override def initialOffset(): Offset = FilesOffset(Seq.empty)
  override def latestOffset(): Offset = FilesOffset(listFiles().map(_._1))

  override def deserializeOffset(json: String): Offset = {
    // inverse of FilesOffset.json — a flat JSON string array
    val items = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inStr = false; var i = 0
    while (i < json.length) {
      val c = json.charAt(i)
      if (!inStr) { if (c == '"') inStr = true }
      else c match {
        case '\\' => sb.append(json.charAt(i + 1)); i += 1
        case '"'  => items += sb.toString; sb.clear(); inStr = false
        case o    => sb.append(o)
      }
      i += 1
    }
    FilesOffset(items.toSeq)
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val seen = start.asInstanceOf[FilesOffset].files.toSet
    val endSet = end.asInstanceOf[FilesOffset].files.toSet
    val byPath = listFiles().toMap
    endSet.diff(seen).toSeq.sorted.flatMap { f =>
      // a file named by the offset but since removed (dynamic
      // overwrite between offset capture and planning) is skipped
      byPath.get(f).map(v =>
        SinkFileSplit(f, v, fullSchema(partCol).dataType): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionedSinkReaderFactory(fullSchema, required, partCol,
      PartitionedSinkWriterFactory.sessionConf())

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class SinkFileSplit(file: String, partValue: String,
                                 keyType: DataType)
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

  private val fs = FileSystem.get(new java.net.URI(split.file), conf.value)
  private val in = new java.io.BufferedReader(new java.io.InputStreamReader(
    fs.open(new Path(split.file)), "UTF-8"))

  // the file carries the data fields in fullSchema order MINUS partCol
  private val dataFields =
    fullSchema.fields.filter(_.name != partCol)
  // required ordinal -> (file column index | -1 for the partition col)
  private val plan: Array[(Int, DataType)] = required.fields.map { f =>
    if (f.name == partCol) (-1, f.dataType)
    else (dataFields.indexWhere(_.name == f.name), f.dataType)
  }
  private val partValue: Any =
    PartitionedSinkReader.castValue(split.partValue, fullSchema(partCol).dataType)

  private def cast(s: String, dt: DataType): Any =
    PartitionedSinkReader.castValue(s, dt)

  private var current: InternalRow = _

  override def next(): Boolean = {
    val line = in.readLine()
    if (line == null) return false
    // -1 keeps trailing empty cells (a NULL in the last column)
    val cells = line.split("\t", -1)
    val values = plan.map { case (idx, dt) =>
      if (idx < 0) partValue
      // SHORT row: the file predates an ADD COLUMNS evolution — the
      // missing trailing cells read as NULL
      else if (idx >= cells.length) null
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
  override def close(): Unit = in.close()
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
