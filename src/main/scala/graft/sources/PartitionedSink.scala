package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Partitioned DataSource V2 SINK — the write half of the engine's
  * connector surface (the read half, with 4-way pushdown, is
  * [[DocGenSource]]; the reference's write surface is the
  * append/overwrite warehouse in reference src/jobs/load_*.py, which
  * delegates the commit problem to Hive — this connector owns it).
  *
  * Layout: hive-style `<root>/<p1>=<v1>/<p2>=<v2>/.../part-*.tsv` —
  * MULTI-LEVEL nested partition directories, one LEAF directory per
  * partition-value TUPLE (the reference's own lake is three-level
  * `flight_year/flight_month/flight_day`, extract_flights.py:96-99),
  * tab-separated data columns in dataSchema order (`\N` = NULL).
  * Readable back through [[PartitionedSink.readBack]] (plain
  * `spark.read.csv` + partition discovery — nothing about the layout
  * is private to this connector).
  *
  * The part that matters at 100 TB is the COMMIT PROTOCOL — a job
  * that writes for an hour from 1000 executors must publish all-or-
  * nothing, under task retry, speculative duplicates, and job abort:
  *
  *   - Every task writes only under `_staging/<queryId>/`, one file
  *     per (task, partition-tuple), named by (partitionId, taskId) —
  *     task attempts NEVER touch the published layout.
  *   - A task's [[DataWriter.commit]] returns a manifest (its staged
  *     files + row counts) as the WriterCommitMessage. Spark's
  *     OutputCommitCoordinator (useCommitCoordinator=true) guarantees
  *     at most ONE attempt per partition commits; a speculative twin
  *     that loses the race gets abort() and deletes its files.
  *   - Driver-side [[BatchWrite.commit]] publishes EXACTLY the files
  *     named in the commit messages — a zombie attempt's orphan
  *     staging file (its executor died before abort could run) is
  *     swept with the staging dir, never published. Exactly-once is
  *     therefore a property of the manifest, not of task scheduling.
  *   - Overwrite semantics run at publish time, inside the one
  *     driver-side commit: TRUNCATE/OverwriteByExpression(true)
  *     clears the whole layout, filter overwrite clears the leaf dirs
  *     matching the equality conjunction (ANY SUBSET of the partition
  *     columns — `month = 3` on a y/m/d table clears March of every
  *     year), dynamic overwrite clears exactly the partition TUPLES
  *     present in the commit manifests. Readers of the old data race
  *     only with the final rename window, not with the whole job.
  *   - [[BatchWrite.abort]] deletes the staging dir; the published
  *     layout is untouched (all-or-nothing).
  *
  * All FS traffic goes through the Hadoop FileSystem API (task-side
  * writers get the SESSION's Hadoop configuration, serialized into the
  * DataWriterFactory — credentials/defaultFS overrides reach the
  * executors), so the same protocol runs on file:/, hdfs:/ or any FS
  * with atomic-enough rename; S3-class stores would swap the rename
  * publish for a manifest commit, which is why publish is a single
  * private method.
  *
  * Types: atomic columns only (string/boolean/int/long/float/double/
  * date-less). Partition columns must be non-null atomics. The text
  * encoding is lossless: Long/Double round-trip through Java's
  * shortest-repr toString exactly, and strings go through
  * [[TsvCodec]] — backslash escapes for the delimiter characters
  * (tab/newline/CR), backslash itself, and the empty string, so a
  * value containing the layout's own syntax (or the literal `\N` NULL
  * token — its backslash gets escaped) round-trips byte-exactly.
  * Partition VALUES are hive-escaped in directory names
  * (`ExternalCatalogUtils.escapePathName` — `/`, `=`, `%`, control
  * chars), which Spark's partition discovery unescapes on read.
  */
/** Lossless string codec for the sink's TSV layout. The escape set is
  * exactly the characters the layout gives meaning to: `\t` (column
  * separator), `\n`/`\r` (row separator), `\` (the escape itself —
  * which also neutralizes the `\N` NULL token: a literal "\N" value
  * writes as `\\N`, never matching the reader's nullValue), plus `\e`
  * for the wholly-empty string (CSV readers are config-dependent about
  * empty-vs-null for a zero-length unquoted field; an explicit token
  * removes the ambiguity). Decode is a single linear scan exposed as a
  * codegen expression so read-back stays inside whole-stage codegen.
  */
object TsvCodec {
  def escape(s: String): String = {
    if (s.isEmpty) return "\\e"
    val sb = new java.lang.StringBuilder(s.length + 4)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Codegen-reachable (static forwarder) decode; inverse of escape. */
  def unescape(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (str.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == '\\' && i + 1 < str.length) {
        str.charAt(i + 1) match {
          case '\\' => sb.append('\\')
          case 't'  => sb.append('\t')
          case 'n'  => sb.append('\n')
          case 'r'  => sb.append('\r')
          case 'e'  => () // empty-string marker: expands to nothing
          case o    => sb.append('\\').append(o) // unknown: keep verbatim
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  /** tsv_unescape(col): the read-back decode as a native expression. */
  case class TsvUnescape(child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      unescape(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.sources.TsvCodec.unescape($c)")
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): TsvUnescape =
      copy(child = c)
  }

  /** Hive-style escaping for partition directory names (`/`, `=`, `%`,
    * control chars → `%xx`); Spark's partition discovery unescapes.
    */
  def escapeDir(value: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(value)
  def unescapeDir(name: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(name)
}

/** Shared geometry of the multi-level hive layout: tuple → leaf-dir
  * mapping, the pruned recursive leaf walk, and the injective file-name
  * encoding of a tuple. Hive escaping always percent-encodes a literal
  * `=` inside a VALUE (`%3D`), so joining ESCAPED values with `=` is
  * collision-free — two distinct tuples can never render to one name.
  */
private[graft] object SinkLayout {
  /** Relative leaf dir for a partition tuple: `p1=v1/p2=v2/...`. */
  def leafRel(partCols: Seq[String], values: Seq[String]): String =
    partCols.zip(values)
      .map { case (c, v) => s"$c=${TsvCodec.escapeDir(v)}" }.mkString("/")

  /** Injective single-segment encoding of a tuple for FILE names. */
  def valueTag(values: Seq[String]): String =
    values.map(TsvCodec.escapeDir).mkString("=")

  /** Recursive leaf listing with PER-LEVEL pruning: at depth i only
    * dirs named `partCols(i)=...` are entered, and only when
    * `keepAt(i, value)` holds — a filter on ANY subset of the partition
    * columns prunes at its own level, whole subtrees at a time.
    * Returns (raw value tuple, leaf dir).
    */
  def listLeaves(fs: FileSystem, root: Path, partCols: Seq[String],
                 keepAt: (Int, String) => Boolean = (_, _) => true)
      : Seq[(Seq[String], Path)] = {
    def walk(dir: Path, level: Int,
             acc: Vector[String]): Seq[(Seq[String], Path)] =
      if (level == partCols.length) Seq((acc, dir))
      else Option(fs.listStatus(dir)).toSeq.flatten
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(partCols(level) + "="))
        .flatMap { s =>
          val v = TsvCodec.unescapeDir(
            s.getPath.getName.stripPrefix(partCols(level) + "="))
          if (keepAt(level, v)) walk(s.getPath, level + 1, acc :+ v)
          else Seq.empty
        }
    if (!fs.exists(root)) Seq.empty else walk(root, 0, Vector.empty)
  }

  /** Data files of one leaf dir (markers and manifests excluded). */
  def dataFiles(fs: FileSystem, leaf: Path): Seq[FileStatus] =
    Option(fs.listStatus(leaf)).toSeq.flatten
      .filter(f => f.isFile && !f.getPath.getName.startsWith(".") &&
        !f.getPath.getName.startsWith("_"))

  /** Delete a leaf dir, then remove now-empty ancestors up to (but
    * never including) the table root — a multi-level overwrite must
    * not leave empty `year=.../month=...` skeletons behind.
    */
  def deleteLeaf(fs: FileSystem, root: Path, leaf: Path): Unit = {
    fs.delete(leaf, true)
    var p = leaf.getParent
    while (p != null && p != root && fs.exists(p) &&
      fs.listStatus(p).isEmpty) {
      fs.delete(p, true)
      p = p.getParent
    }
  }
}

class PartitionedSink extends TableProvider {
  // the sink infers nothing; schema comes from the written DataFrame
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil)
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PartitionedSinkTable(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("PartitionedSink needs a path")),
      Option(properties.get("partitionBy")).map(
        _.split(",").map(_.trim).filter(_.nonEmpty).toSeq).filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(
          "PartitionedSink needs option partitionBy=<col>[,<col>...]")),
      schema,
      // graft.* write options ride as table properties on the path API
      // (`.option("graft.format", "parquet")`); the path default stays
      // TSV — only catalog-created tables flip the parquet default
      props = properties.asScala.toMap
        .filter { case (k, _) => k.startsWith("graft.") })
}

object PartitionedSink {
  final val NullToken = "\\N"

  /** Read a sink layout back as a DataFrame: partition discovery over
    * the hive-style dirs plus an explicit data schema (no inference —
    * deterministic types). An empty layout (no partition dirs — e.g.
    * the job wrote zero rows) returns a schema-correct empty frame.
    */
  def readBack(spark: SparkSession, root: String, dataSchema: StructType,
               partCol: String, partType: DataType = StringType): DataFrame =
    readBackParts(spark, root, dataSchema, Seq(partCol -> partType))

  /** Multi-level variant: `partCols` in layout order (outermost
    * first), each with its read-back type.
    */
  def readBackParts(spark: SparkSession, root: String,
                    dataSchema: StructType,
                    partCols: Seq[(String, DataType)]): DataFrame = {
    val fs = FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new Path(root)
    val firstCol = partCols.head._1
    val hasParts = fs.exists(rootPath) && fs.listStatus(rootPath)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith(firstCol + "="))
    if (!hasParts)
      emptyFrame(spark, dataSchema, partCols)
    else {
      // explicit file listing (not a glob): the per-file format
      // dispatch in readPaths needs extensions, and the pruned leaf
      // walk already exists
      val files = SinkLayout.listLeaves(fs, rootPath, partCols.map(_._1))
        .flatMap { case (_, leaf) =>
          SinkLayout.dataFiles(fs, leaf).map(_.getPath.toString) }
      readPaths(spark, root, files, dataSchema, partCols)
    }
  }

  private def emptyFrame(spark: SparkSession, dataSchema: StructType,
                         partCols: Seq[(String, DataType)]): DataFrame = {
    val full = StructType(dataSchema.fields ++
      partCols.map { case (c, t) => StructField(c, t) })
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
  }

  /** EXPLICIT data-file paths (or globs) of one sink layout as rows —
    * the shared decode behind [[readBackParts]] and the change feed
    * ([[graft.ops.Compaction.tableChanges]], which reads exactly a
    * manifest-diff's files). Partition columns come from partition
    * discovery against `basePath` (the dir names), data columns from
    * the TSV payload through the [[TsvCodec]] decode.
    */
  private[graft] def readPaths(spark: SparkSession, root: String,
                               paths: Seq[String], dataSchema: StructType,
                               partCols: Seq[(String, DataType)]): DataFrame = {
    if (paths.isEmpty) return emptyFrame(spark, dataSchema, partCols)
    import org.apache.spark.sql.functions.col
    // per-file FORMAT dispatch by extension, mirroring the DSv2
    // reader factory: a table whose graft.format changed mid-life
    // reads correctly file by file
    val (pq, tsv) = paths.partition(_.endsWith(".parquet"))
    val sides = Seq(
      if (tsv.isEmpty) None else Some {
        val raw = partCols.foldLeft(
          spark.read
            .schema(dataSchema)
            .option("sep", "\t")
            .option("nullValue", NullToken)
            // quote handling OFF: the layout's own [[TsvCodec]] escaping
            // is the one decode layer — a value starting with '"' must
            // not trigger CSV quote semantics
            .option("quote", "")
            .option("basePath", root)
            .csv(tsv: _*)) { case (df, (c, t)) =>
          df.withColumn(c, col(c).cast(t))
        }
        // decode the TsvCodec escapes on every string DATA column (the
        // partition columns come from the dir names, hive-unescaped by
        // partition discovery, not from the TSV payload)
        dataSchema.fields.filter(_.dataType == StringType).foldLeft(raw) {
          (df, f) =>
            df.withColumn(f.name, org.apache.spark.sql.GraftColumnShim.column(
              TsvCodec.TsvUnescape(org.apache.spark.sql.GraftColumnShim
                .expression(col(f.name)))))
        }
      },
      if (pq.isEmpty) None else Some {
        // parquet is self-describing — no unescape layer; partition
        // columns still come from the dir names via basePath discovery
        partCols.foldLeft(
          spark.read
            .schema(dataSchema)
            .option("basePath", root)
            .parquet(pq: _*)) { case (df, (c, t)) =>
          df.withColumn(c, col(c).cast(t))
        }
      }).flatten
    sides.reduce(_ unionByName _)
  }
}

private[sources] class PartitionedSinkTable(path: String,
                                            val partCols: Seq[String],
                                            schema0: StructType,
                                            versioned: Boolean = false,
                                            asOfVersion: Option[Long] = None,
                                            val props: Map[String, String] =
                                              Map.empty)
    extends Table with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  require(partCols.nonEmpty, "PartitionedSink needs at least one partition column")
  override def name(): String =
    s"partitioned_sink($path by ${partCols.mkString(",")})" +
      asOfVersion.map(v => s" VERSION AS OF $v").getOrElse("")
  override def schema(): StructType = schema0
  override def partitioning(): Array[Transform] =
    partCols.map(c => org.apache.spark.sql.connector.expressions.Expressions
      .identity(c): Transform).toArray
  override def capabilities(): util.Set[TableCapability] = Set(
    TableCapability.BATCH_READ,
    TableCapability.MICRO_BATCH_READ,
    TableCapability.BATCH_WRITE,
    TableCapability.STREAMING_WRITE,
    TableCapability.TRUNCATE,
    TableCapability.OVERWRITE_BY_FILTER,
    TableCapability.OVERWRITE_DYNAMIC).asJava

  override def properties(): util.Map[String, String] = props.asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOfVersion.isEmpty,
      "cannot write to a time-travel (VERSION AS OF) table reference")
    new PartitionedSinkWriteBuilder(path, partCols, info, versioned, props)
  }

  override def newScanBuilder(
      options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new PartitionedSinkScanBuilder(path, partCols, schema0, asOfVersion,
      SinkFormat.fieldIds(props))

  /** Metadata columns: `_file` — the row's data-file path, a per-split
    * constant (the row-level rewrites use it for runtime group
    * filtering) — and `_pos`, the row's stable position within its
    * file (byte offset of the line for TSV, file row index for
    * parquet; the merge-on-read delete identity). A DATA column with
    * the same name shadows either (Spark's standard conflict rule).
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(SinkMeta.FileMetaCol, SinkMeta.PosMetaCol)

  /** SQL row-level surface: DELETE / UPDATE / MERGE rewrite the file
    * groups containing matches (copy-on-write) — see
    * [[SinkRowLevelOperation]].
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(asOfVersion.isEmpty,
      s"cannot ${info.command} a time-travel (VERSION AS OF) table reference")
    SinkFormat.deleteMode(props) match {
      case "mor" => () => new SinkRowLevelDeltaOperation(path, partCols,
        schema0, versioned, info.command, props)
      case _ => () => new SinkRowLevelOperation(path, partCols, schema0,
        versioned, info.command, props)
    }
  }

  /** METADATA-ONLY deletes: a DELETE whose predicates are equality
    * conjunctions over partition columns (or an unconditional DELETE)
    * drops whole leaves without reading a row — Catalyst's
    * OptimizeMetadataOnlyDeleteFromTable prefers this path and falls
    * back to the copy-on-write rewrite for anything canDeleteWhere
    * declines. On a versioned table the leaves retire LOGICALLY
    * (a new manifest without them — time-travel safe), matching every
    * other overwrite mode.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOfVersion.isEmpty && filters.forall {
      case _: AlwaysTrue => true
      case EqualTo(c, v) => partCols.contains(c) && v != null
      case _ => false
    }

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(asOfVersion.isEmpty,
      "cannot DELETE from a time-travel (VERSION AS OF) table reference")
    val mode: SinkMode =
      if (filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue]))
        Truncate
      else {
        // AlwaysTrue conjuncts are redundant (TRUE AND p=v is p=v) —
        // drop them before the equality check, or a mixed array that
        // canDeleteWhere accepted would fail here at runtime
        val nonTrivial = filters.filterNot(_.isInstanceOf[AlwaysTrue])
        val eqs = nonTrivial.collect { case EqualTo(c, v) => c -> v.toString }
        require(eqs.length == nonTrivial.length,
          s"deleteWhere got non-partition filters: ${filters.mkString(", ")}")
        // contradictory equalities on one column (`p = 1 AND p = 2`)
        // match no rows — a no-op delete, not an error
        if (eqs.groupBy(_._1).exists(_._2.map(_._2).distinct.length > 1))
          return
        OverwriteEq(eqs.toMap)
      }
    SinkCommit.publish(SinkCommit.fsFor(path), path, partCols, mode,
      Seq.empty, _ => "", statsToken = java.util.UUID.randomUUID().toString,
      versioned = versioned)
  }
}

/** Overwrite mode resolved at build time from which mix-in Spark
  * calls: none = append, truncate()/overwrite(AlwaysTrue) = full
  * replace, overwrite(p1 = v1 [, p2 = v2 ...]) = replace the leaf
  * partitions matching the conjunction (any SUBSET of the partition
  * columns), overwriteDynamicPartitions() = replace the partition
  * tuples the job writes.
  */
private class PartitionedSinkWriteBuilder(path: String, partCols: Seq[String],
                                          info: LogicalWriteInfo,
                                          versioned: Boolean = false,
                                          props: Map[String, String] =
                                            Map.empty)
    extends WriteBuilder with SupportsOverwrite with SupportsDynamicOverwrite {

  private var mode: SinkMode = Append
  partCols.foreach(pc => require(info.schema().fieldNames.contains(pc),
    s"partition column $pc not in written schema ${info.schema().sql}"))
  // loud at plan time: binary columns need the parquet format (the
  // path API's default is TSV) and can never partition
  info.schema().fields.foreach(f => SinkFormat.validateColumnType(
    SinkFormat.fromProps(props), f.name, f.dataType,
    partCols.contains(f.name)))

  override def truncate(): WriteBuilder = { mode = Truncate; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    mode =
      if (filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue]))
        Truncate
      else {
        val eqs = filters.map {
          case EqualTo(c, v) if partCols.contains(c) => c -> v.toString
          case f => throw new UnsupportedOperationException(
            s"PartitionedSink overwrite supports only <partitionCol> = " +
              s"<value> conjunctions over [${partCols.mkString(", ")}], got $f")
        }
        require(eqs.map(_._1).distinct.length == eqs.length,
          s"duplicate partition column in overwrite filter: ${filters.mkString(", ")}")
        OverwriteEq(eqs.toMap)
      }
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    mode = Dynamic; this
  }

  override def build(): Write = {
    // OPT-IN clustered writes (`graft.writeDistribution = 'hash'`,
    // Iceberg's write.distribution-mode shape): request a cluster-by-
    // partition-tuple exchange before the write, so each tuple lands
    // in few tasks → few files, instead of one file per (task, tuple)
    // — at 1000 executors an unclustered append fragments every
    // partition 1000 ways. Default stays unclustered ('none'): small
    // pipelines prefer no extra shuffle, and the compact() procedure
    // exists for repair. The rewrite (row-level) write clusters
    // unconditionally — see SinkRowLevelOperation.
    val clustered = props.get("graft.writeDistribution") match {
      case Some("hash") => true
      case Some("none") | None => false
      case Some(other) => throw new IllegalArgumentException(
        s"graft.writeDistribution must be 'hash' or 'none', got '$other'")
    }
    // SORT-ORDER CLUSTERING (`graft.sortOrder`): range-distribute on
    // (partition tuple, sort columns) and sort within tasks — files in
    // a partition then carve the sort domain into DISJOINT ranges, so
    // the stats manifests' min/max skip files on a non-partition
    // column and parquet row groups carry tight bounds. Subsumes the
    // 'hash' mode when both are set (an ordered distribution is
    // clustered on its prefix).
    val sortCols = SinkFormat.sortOrder(props, partCols, info.schema())
    if (sortCols.nonEmpty) new Write with RequiresDistributionAndOrdering {
      private def orders
          : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
        (partCols ++ sortCols).map(c =>
          org.apache.spark.sql.connector.expressions.Expressions.sort(
            org.apache.spark.sql.connector.expressions.Expressions.column(c),
            org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)
          : org.apache.spark.sql.connector.expressions.SortOrder).toArray
      override def requiredDistribution()
          : org.apache.spark.sql.connector.distributions.Distribution =
        org.apache.spark.sql.connector.distributions.Distributions
          .ordered(orders)
      override def distributionStrictlyRequired(): Boolean = false
      override def requiredOrdering()
          : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
        orders
      override def toBatch: BatchWrite =
        new PartitionedSinkBatchWrite(path, partCols, info.schema(),
          info.queryId(), mode, versioned, props)
      override def toStreaming:
          org.apache.spark.sql.connector.write.streaming.StreamingWrite =
        new PartitionedSinkStreamingWrite(path, partCols, info.schema(),
          info.queryId(), mode, versioned, props)
    } else if (clustered) new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution()
          : org.apache.spark.sql.connector.distributions.Distribution =
        org.apache.spark.sql.connector.distributions.Distributions
          .clustered(partCols.map(c =>
            org.apache.spark.sql.connector.expressions.Expressions
              .identity(c)
              : org.apache.spark.sql.connector.expressions.Expression)
            .toArray)
      override def distributionStrictlyRequired(): Boolean = false
      override def requiredOrdering()
          : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
        Array.empty
      override def toBatch: BatchWrite =
        new PartitionedSinkBatchWrite(path, partCols, info.schema(),
          info.queryId(), mode, versioned, props)
      override def toStreaming:
          org.apache.spark.sql.connector.write.streaming.StreamingWrite =
        new PartitionedSinkStreamingWrite(path, partCols, info.schema(),
          info.queryId(), mode, versioned, props)
    } else new Write {
      override def toBatch: BatchWrite =
        new PartitionedSinkBatchWrite(path, partCols, info.schema(),
          info.queryId(), mode, versioned, props)
      override def toStreaming:
          org.apache.spark.sql.connector.write.streaming.StreamingWrite =
        new PartitionedSinkStreamingWrite(path, partCols, info.schema(),
          info.queryId(), mode, versioned, props)
    }
  }
}

private sealed trait SinkMode extends Serializable
private case object Append extends SinkMode
private case object Truncate extends SinkMode
/** Equality conjunction over a SUBSET of the partition columns. */
private case class OverwriteEq(eqs: Map[String, String]) extends SinkMode
private case object Dynamic extends SinkMode

/** Per-file, per-column min/max over the NON-NULL values — the file-
  * skipping statistics a text layout doesn't get from its format (the
  * pruning a Parquet lake reads from row-group footers). `minMax` is
  * None when every value in the file is NULL for the column — which
  * lets the reader skip the file for ANY comparison predicate on it
  * (SQL comparisons with NULL are never true). Columns with no entry
  * (unsupported types, or a file containing NaN/±Inf) carry no stats
  * and are never skipped on.
  */
private[graft] case class SinkColStat(col: String,
                                        minMax: Option[(String, String)])

/** Truncated STRING bounds for the skipping manifests, Iceberg-style:
  * a string column's recorded min is the 16-code-point PREFIX of the
  * true minimum (a prefix never exceeds its source, so it stays a
  * valid lower bound), and its recorded max is the 16-code-point
  * prefix of the true maximum with the last code point INCREMENTED
  * when anything was cut — strictly greater than every value that
  * shares the prefix, so it stays a valid upper bound. All ordering is
  * binary UTF-8 ([[org.apache.spark.unsafe.types.UTF8String]] — the
  * engine's own string comparison), never Java's UTF-16 char order,
  * which disagrees above the BMP. The bbee179 lesson applies verbatim:
  * a truncated bound must never prove an exclusion it can't prove —
  * prefixes only ever WIDEN the recorded range, and values whose
  * 16-cp prefix contains a lone surrogate poison the column (their
  * UTF-8 rendering is not order-faithful), trading skips for safety.
  */
private[graft] object SinkStrBounds {
  final val MaxLen = 16 // code points

  def cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** (≤16-code-point prefix, anything cut?); None = poisoned (a lone
    * surrogate inside the prefix).
    */
  def truncate(s: String): Option[(String, Boolean)] = {
    val n = s.codePointCount(0, s.length)
    val cut = n > MaxLen
    val prefix =
      if (cut) s.substring(0, s.offsetByCodePoints(0, MaxLen)) else s
    var i = 0
    while (i < prefix.length) {
      val c = prefix.charAt(i)
      val high = Character.isHighSurrogate(c)
      if (Character.isLowSurrogate(c)) return None // lone low surrogate
      if (high && (i + 1 >= prefix.length ||
        !Character.isLowSurrogate(prefix.charAt(i + 1)))) return None
      i += (if (high) 2 else 1)
    }
    Some((prefix, cut))
  }

  /** Upper bound for a (possibly truncated) max prefix: untruncated is
    * its own exact max; truncated increments the LAST code point
    * (skipping the surrogate gap U+D800–U+DFFF), dropping trailing
    * maxed-out points. None when no representable bound exists (every
    * code point is U+10FFFF) — the column then carries no stats.
    */
  def upperBound(prefix: String, truncated: Boolean): Option[String] = {
    if (!truncated) return Some(prefix)
    val cps = prefix.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0) {
      val c = cps(i)
      if (c < 0x10FFFF) {
        val next = if (c == 0xD7FF) 0xE000 else c + 1
        val out = cps.take(i) :+ next
        return Some(new String(out, 0, out.length))
      }
      i -= 1
    }
    None
  }
}

/** One staged file, as named by the task that wrote it. `blooms` is
  * (column, serialized [[org.apache.spark.util.sketch.BloomFilter]])
  * for each bloom-enabled column whose per-file distinct count stayed
  * under the cap.
  */
private case class StagedFile(partValues: Seq[String], stagedPath: String,
                              rows: Long, partitionId: Int,
                              stats: Seq[SinkColStat] = Seq.empty,
                              blooms: Seq[(String, Array[Byte])] = Seq.empty)
private case class SinkCommitMessage(files: Seq[StagedFile])
    extends WriterCommitMessage

/** BLOOM-FILTER file skipping for POINT lookups — the pruning min/max
  * ranges cannot give: on a high-cardinality UNCLUSTERED column
  * (an id column not sorted into the layout), every file's [min, max]
  * spans the whole key domain and range skipping keeps everything,
  * while a per-file Bloom filter answers `key = x` with "definitely
  * absent" for ~99 % of non-containing files (fpp-bounded false
  * POSITIVES only — a false positive scans a file needlessly, never
  * returns a wrong row; false negatives are impossible by
  * construction, so no matching row is ever skipped). Parquet solves
  * the same problem with column bloom filters in the footer; the
  * filter here is Spark's own [[org.apache.spark.util.sketch.BloomFilter]]
  * (the sketch behind Spark's runtime bloom-join pruning).
  *
  * Opt-in per session: `spark.graft.sink.bloomColumns=c1,c2` names the
  * columns (integral and string types; others are silently ineligible —
  * float equality is a precision trap, bbee179). Writers accumulate
  * each file's DISTINCT values (bounded: `bloomMaxDistinct` values,
  * default 131072, strings additionally capped at 8 MB cumulative —
  * overflow drops the filter for that file-column: degraded to a scan,
  * never wrong) and serialize a right-sized filter at task commit
  * (`bloomFpp`, default 1 %). Publish writes them to per-leaf
  * `_bloom-<token>.tsv` manifests (same append-only, rename-last
  * discipline as the stats manifests); the scan probes them for
  * EqualTo/In skip filters after the min/max pass.
  */
private[graft] object SinkBloomConf {
  final val ColumnsKey = "spark.graft.sink.bloomColumns"
  final val FppKey = "spark.graft.sink.bloomFpp"
  final val MaxDistinctKey = "spark.graft.sink.bloomMaxDistinct"
  final val MaxStringBytes = 8L << 20

  def eligible(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }

  /** Table-property keys (persisted in the catalog sidecar —
    * `TBLPROPERTIES ('graft.bloomColumns' = 'k')` outlives the
    * session and binds every writer of the table; the session conf
    * remains the path-API/global fallback).
    */
  final val PropColumns = "graft.bloomColumns"
  final val PropFpp = "graft.bloomFpp"
  final val PropMaxDistinct = "graft.bloomMaxDistinct"

  /** (columns, fpp, maxDistinct), driver-side: table properties first,
    * session conf as the fallback for each knob independently.
    */
  def fromSession(props: Map[String, String] = Map.empty)
      : (Seq[String], Double, Int) = {
    val conf = SparkSession.active.conf
    val cols = props.get(PropColumns).orElse(conf.getOption(ColumnsKey))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val fpp = props.get(PropFpp).orElse(conf.getOption(FppKey))
      .map(_.toDouble).getOrElse(0.01)
    require(fpp > 0 && fpp < 1, s"$FppKey must be in (0, 1), got $fpp")
    val maxD = props.get(PropMaxDistinct).orElse(conf.getOption(MaxDistinctKey))
      .map(_.toInt).getOrElse(131072)
    require(maxD > 0, s"$MaxDistinctKey must be positive, got $maxD")
    (cols, fpp, maxD)
  }
}

/** Per-leaf bloom manifests: `_bloom-<token>.tsv`, one line per
  * (file, column): `file \t col \t base64(filter)`. Same lifecycle as
  * the stats manifests (publish-appended, dir-scoped, swept with the
  * leaf); a file without an entry is scanned, never skipped.
  */
private[graft] object SinkBlooms {
  def manifestName(token: String): String =
    s"_bloom-${TsvCodec.escapeDir(token)}.tsv"

  def write(fs: FileSystem, dir: Path, token: String,
            entries: Seq[(String, Seq[(String, Array[Byte])])]): Unit = {
    val lines = entries.flatMap { case (file, blooms) =>
      blooms.map { case (col, bytes) =>
        s"${TsvCodec.escape(file)}\t${TsvCodec.escape(col)}\t" +
          java.util.Base64.getEncoder.encodeToString(bytes)
      }
    }
    if (lines.nonEmpty) {
      val out = fs.create(new Path(dir, manifestName(token)), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** file name → (column → deserialized filter). Unreadable entries
    * are dropped (scanned, never wrong).
    */
  def readDir(fs: FileSystem, dir: Path)
      : Map[String, Map[String, org.apache.spark.util.sketch.BloomFilter]] = {
    val manifests = Option(fs.listStatus(dir)).toSeq.flatten
      .filter(s => s.isFile && s.getPath.getName.startsWith("_bloom-"))
    val u = (s: String) =>
      TsvCodec.unescape(org.apache.spark.unsafe.types.UTF8String
        .fromString(s)).toString
    manifests.flatMap { m =>
      val in = fs.open(m.getPath)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
        line.split("\t", -1) match {
          case Array(f, c, b64) =>
            try Some((u(f), u(c), org.apache.spark.util.sketch.BloomFilter
              .readFrom(java.util.Base64.getDecoder.decode(b64))))
            catch { case _: Exception => None }
          case _ => None
        }
      }
    }.groupBy(_._1).map { case (f, es) =>
      f -> es.map { case (_, c, bf) => c -> bf }.toMap
    }
  }
}

/** Per-file statistics as read back from the manifests: exact row
  * count (None when unrecorded) and per-column min/max over non-null
  * values (inner None = the column is entirely NULL in the file).
  */
private[graft] case class SinkFileStats(
    rows: Option[Long],
    cols: Map[String, Option[(String, String)]])

/** Per-partition-dir stats manifests: `_stats-<token>.tsv`, one per
  * PUBLISH into the dir (append-friendly — no read-modify-write of a
  * shared manifest, so concurrent appends stay conflict-free under the
  * same rename protocol as the data). One line per (file, column):
  * `file \t col \t min \t max`, TsvCodec-escaped fields, `\N` min/max
  * for the all-NULL case; one ROW-COUNT line per file with the raw
  * `\N` token in the column field (unambiguous — a real column named
  * "\N" escapes to "\\N"): `file \t \N \t <rows> \t \N`. Keyed by
  * destination FILE NAME: a dynamic overwrite deletes the whole dir
  * (stats go with it), a compaction republished through the sink
  * regenerates them, and an entry whose file no longer exists is
  * simply never looked up. Written AFTER the data renames — a crash in
  * between leaves a file without stats, which readers scan instead of
  * skip (degraded, never wrong).
  */
private[graft] object SinkStats {
  def manifestName(token: String): String =
    s"_stats-${TsvCodec.escapeDir(token)}.tsv"

  def write(fs: FileSystem, dir: Path, token: String,
            entries: Seq[(String, Option[Long], Seq[SinkColStat])]): Unit = {
    val lines = entries.flatMap { case (file, rows, stats) =>
      val f = TsvCodec.escape(file)
      rows.map(n =>
        s"$f\t${PartitionedSink.NullToken}\t$n\t${PartitionedSink.NullToken}")
        .toSeq ++
        stats.map { st =>
          // bounds are ESCAPED (string bounds can contain the layout's
          // own delimiters); the all-NULL marker stays the raw token —
          // a real bound value "\N" escapes to "\\N", never colliding
          val (mn, mx) = st.minMax
            .map { case (a, b) => (TsvCodec.escape(a), TsvCodec.escape(b)) }
            .getOrElse((PartitionedSink.NullToken, PartitionedSink.NullToken))
          s"$f\t${TsvCodec.escape(st.col)}\t$mn\t$mx"
        }
    }
    if (lines.nonEmpty) {
      val out = fs.create(new Path(dir, manifestName(token)), true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** file name → its recorded statistics. */
  def readDir(fs: FileSystem, dir: Path): Map[String, SinkFileStats] = {
    val manifests = Option(fs.listStatus(dir)).toSeq.flatten
      .filter(s => s.isFile && s.getPath.getName.startsWith("_stats-"))
    val u = (s: String) =>
      TsvCodec.unescape(org.apache.spark.unsafe.types.UTF8String
        .fromString(s)).toString
    val parsed = manifests.flatMap { m =>
      val in = fs.open(m.getPath)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
        line.split("\t", -1) match {
          case Array(f, c, mn, mx) => Some((u(f), c, mn, mx))
          case _ => None // malformed line: no stats, never wrong
        }
      }
    }
    parsed.groupBy(_._1).map { case (f, es) =>
      val rows = es.collectFirst {
        case (_, c, n, _) if c == PartitionedSink.NullToken &&
          n.forall(_.isDigit) && n.nonEmpty => n.toLong
      }
      val cols = es.filter(_._2 != PartitionedSink.NullToken)
        .map { case (_, c, mn, mx) =>
          // unescape is identity on the numeric renderings older
          // manifests wrote raw — backward compatible
          u(c) -> (if (mn == PartitionedSink.NullToken) None
                   else Some((u(mn), u(mx))))
        }.toMap
      f -> SinkFileStats(rows, cols)
    }
  }
}

/** Version manifests for time travel — `_versions/<v>` at the table
  * root, each an immutable FULL SNAPSHOT of the live data files after
  * publish v (one line per file: `relPath \t v1 [\t v2 ...]` — the
  * partition TUPLE, escaped, one field per partition column; a
  * single-column table's manifests are byte-identical to the pre-
  * multi-level format, so old tables read unchanged).
  * On a VERSIONED table, overwrite modes retire files LOGICALLY (they
  * drop out of the next manifest; nothing is physically deleted), so
  * `VERSION AS OF v` replans exactly manifest v's files; reads of the
  * LATEST version are manifest-driven too, which is what makes the
  * deferred deletes invisible. [[graft.ops.Compaction.vacuumVersions]]
  * reclaims: drop expired manifests, then delete any data file no
  * retained manifest references. Versioning is opt-in per catalog
  * (`spark.sql.catalog.<name>.versioned=true`) and STICKY per table
  * (once `_versions/` exists, every publish maintains it) — the
  * default layout keeps its delete-on-overwrite behavior and its
  * listing-based readers (the V1 readBack glob cannot see manifests,
  * so it must not be pointed at a versioned table that has ever
  * overwritten).
  */
private[graft] object SinkVersions {
  def dir(root: String): Path = new Path(root, "_versions")

  def isVersioned(fs: FileSystem, root: String): Boolean =
    fs.exists(dir(root))

  def latest(fs: FileSystem, root: String): Option[Long] = {
    val d = dir(root)
    if (!fs.exists(d)) None
    else Option(fs.listStatus(d)).toSeq.flatten
      .filter(s => s.isFile && s.getPath.getName.forall(_.isDigit))
      .map(_.getPath.getName.toLong) match {
      case Seq() => None
      case vs => Some(vs.max)
    }
  }

  /** Header lines start with a bare `#` FIELD (collision-free: a data
    * line's first field is a relative path, which always contains
    * '/'). `#\tts\t<epoch-millis>` records the commit wall clock —
    * the resolution target of `TIMESTAMP AS OF`. Pre-header manifests
    * (older tables) parse unchanged and simply carry no timestamp.
    */
  private def rawLines(fs: FileSystem, root: String, v: Long): Seq[String] = {
    val p = new Path(dir(root), v.toString)
    if (!fs.exists(p)) throw new IllegalArgumentException(
      s"version $v of $root does not exist (expired by vacuum, or never " +
        "published)")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Manifest v: (relative data-file path, raw partition tuple). */
  def read(fs: FileSystem, root: String,
           v: Long): Seq[(String, Seq[String])] = {
    val u = (s: String) => TsvCodec.unescape(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    rawLines(fs, root, v).filterNot(_.startsWith("#\t")).map { line =>
      val fields = line.split("\t", -1)
      require(fields.length >= 2, s"malformed version manifest line: $line")
      (u(fields.head), fields.tail.toSeq.map(u))
    }
  }

  /** Commit wall clock of manifest v (epoch millis); None on manifests
    * written before timestamps existed.
    */
  def readTimestamp(fs: FileSystem, root: String, v: Long): Option[Long] =
    rawLines(fs, root, v).collectFirst {
      case line if line.startsWith("#\tts\t") =>
        line.split("\t", -1) match {
          case Array("#", "ts", ms) if ms.nonEmpty && ms.forall(_.isDigit) =>
            Some(ms.toLong)
          case _ => None
        }
    }.flatten

  /** ACTIVE position-delete manifests of snapshot v (`#\tdel\t<name>`
    * headers): file names under `_deletes/`, in header order. Carried
    * forward by every publish until a truncate clears them or vacuum
    * retires them with their last referencing snapshot; a scan of
    * snapshot v anti-filters its rows through exactly these.
    */
  def readDeletes(fs: FileSystem, root: String, v: Long): Seq[String] =
    rawLines(fs, root, v).collect {
      case line if line.startsWith("#\tdel\t") =>
        TsvCodec.unescape(org.apache.spark.unsafe.types.UTF8String
          .fromString(line.split("\t", -1)(2))).toString
    }

  /** Row-grain CHANGE directory of the commit that produced snapshot v
    * (`#\tchanges\t<dirname>` header): a dir name under `_changes/`
    * holding per-change-type parquet subdirs — written by row-level
    * commits when `graft.rowChanges` is on; the change feed emits its
    * rows instead of the file-grain manifest diff for that transition.
    */
  def readChangesDir(fs: FileSystem, root: String, v: Long): Option[String] =
    rawLines(fs, root, v).collectFirst {
      case line if line.startsWith("#\tchanges\t") =>
        TsvCodec.unescape(org.apache.spark.unsafe.types.UTF8String
          .fromString(line.split("\t", -1)(2))).toString
    }

  /** Newest version whose commit timestamp is ≤ `tsMillis` — the
    * `TIMESTAMP AS OF` resolution (Delta's contract). Fails loudly
    * when the table has no timestamped commit at or before the asked
    * instant (travel before the first commit), and ignores
    * pre-timestamp manifests (they cannot prove their wall clock).
    */
  def resolveTimestamp(fs: FileSystem, root: String, tsMillis: Long): Long = {
    val d = dir(root)
    val versions =
      if (!fs.exists(d)) Seq.empty[Long]
      else Option(fs.listStatus(d)).toSeq.flatten
        .filter(s => s.isFile && s.getPath.getName.forall(_.isDigit))
        .map(_.getPath.getName.toLong).sorted
    val stamped = versions.flatMap(v =>
      readTimestamp(fs, root, v).map(v -> _))
    stamped.filter(_._2 <= tsMillis).map(_._1).maxOption.getOrElse {
      throw new IllegalArgumentException(
        s"no version of $root committed at or before epoch-millis " +
          s"$tsMillis (earliest timestamped commit: " +
          s"${stamped.headOption.map(_._2).getOrElse("none")})")
    }
  }

  /** The current PHYSICAL layout as manifest entries — the seed for a
    * table whose versioning was enabled after it already had data.
    */
  def listingEntries(fs: FileSystem, root: String,
                     partCols: Seq[String]): Seq[(String, Seq[String])] =
    SinkLayout.listLeaves(fs, new Path(root), partCols)
      .flatMap { case (values, leaf) =>
        val rel = SinkLayout.leafRel(partCols, values)
        SinkLayout.dataFiles(fs, leaf)
          .map(f => s"$rel/${f.getPath.getName}" -> values)
      }

  /** Attempt to commit manifest v. Returns false when version v was
    * taken by a concurrent publisher — the CAS signal for the retry
    * loop in [[SinkCommit.publish]]. The commit is a no-overwrite
    * rename through [[org.apache.hadoop.fs.FileContext]] (whose
    * Rename.NONE contract REJECTS an existing destination — plain
    * `FileSystem.rename` on a local FS silently replaces it, which
    * would lose the racing publisher's snapshot).
    */
  def tryWrite(fs: FileSystem, root: String, v: Long,
               entries: Seq[(String, Seq[String])],
               dels: Seq[String] = Seq.empty,
               changesDir: Option[String] = None): Boolean = {
    val d = dir(root)
    fs.mkdirs(d)
    val tmp = new Path(d, s".tmp-$v-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    // commit wall clock + delete/changes linkage ride the SAME
    // CAS-renamed file as the entries (a sibling written after the
    // rename could be torn off by a crash)
    val header = s"#\tts\t${System.currentTimeMillis()}\n" +
      dels.map(n => s"#\tdel\t${TsvCodec.escape(n)}\n").mkString +
      changesDir.map(n => s"#\tchanges\t${TsvCodec.escape(n)}\n")
        .getOrElse("")
    try out.write((header + entries.map { case (rel, values) =>
      (TsvCodec.escape(rel) +: values.map(TsvCodec.escape)).mkString("\t")
    }.mkString("", "\n", "\n")).getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      d.toUri, fs.getConf)
    try { fc.rename(tmp, new Path(d, v.toString)); true }
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException |
           _: org.apache.hadoop.fs.ParentNotDirectoryException =>
        fs.delete(tmp, false); false
    }
  }
}

/** POSITION-DELETE manifests (Iceberg v2's merge-on-read shape): one
  * file per MOR commit under `_deletes/`, one line per deleted row —
  * `escaped(relPath) \t pos` (pos = the `_pos` row identity: byte
  * offset for TSV rows, file row index for parquet). A snapshot's
  * ACTIVE manifests are the `#\tdel` headers of its version manifest;
  * scans anti-filter through them, `compact` folds them into
  * rewritten files, vacuum reclaims manifests no retained snapshot
  * references. The 100 TB posture: a 1-row GDPR delete writes O(1)
  * bytes instead of rewriting its file; readers pay one small
  * manifest read per split (manifests are per-commit, bounded by the
  * compaction cadence).
  */
private[graft] object SinkDeletes {
  def dir(root: String): Path = new Path(root, "_deletes")

  def write(fs: FileSystem, root: String, name: String,
            entries: Seq[(String, Long)]): Unit = {
    val d = dir(root)
    fs.mkdirs(d)
    val tmp = new Path(d, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(entries.sortBy(e => (e._1, e._2)).map { case (rel, pos) =>
      s"${TsvCodec.escape(rel)}\t$pos"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(d, name)))
      throw new java.io.IOException(s"delete-manifest commit failed: $name")
  }

  /** Process-level cache of parsed manifests: they are IMMUTABLE
    * (uuid-named, written once, only ever deleted by vacuum), so on an
    * executor running many splits of one table the manifest is read
    * once, not once per split. Bounded LRU-ish (insertion-ordered,
    * oldest evicted) — delete manifests are per-commit and small, but
    * a long-lived executor must not accumulate every table's history.
    */
  private val cache =
    new java.util.LinkedHashMap[String, Seq[(String, Long)]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[(String, Long)]]): Boolean =
        size() > 64
    }

  def read(fs: FileSystem, p: Path): Seq[(String, Long)] = {
    val key = p.toString
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    if (!fs.exists(p)) throw new IllegalStateException(
      s"position-delete manifest $p no longer exists — vacuumed beyond " +
        "retention?")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val parsed = text.split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
      line.split("\t", -1) match {
        case Array(rel, pos) if pos.nonEmpty && pos.forall(_.isDigit) =>
          Some((TsvCodec.unescape(org.apache.spark.unsafe.types.UTF8String
            .fromString(rel)).toString, pos.toLong))
        case _ => None
      }
    }
    cache.synchronized { cache.put(key, parsed) }
    parsed
  }

  /** The positions deleted from ONE file, across the given manifests
    * (absolute paths) — the executor-side load behind a split's
    * anti-filter.
    */
  def positionsFor(fs: FileSystem, manifests: Seq[String],
                   rel: String): java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    manifests.foreach { m =>
      read(fs, new Path(m)).foreach { case (r, pos) =>
        if (r == rel) set.add(pos)
      }
    }
    set
  }
}

/** The shared driver-side publish: clear whatever the mode says must
  * go, then move exactly the manifest-listed staged files to their
  * destination names. Batch prefixes the staged (taskId-unique) name
  * with a query-unique token (task ids restart per application —
  * without the token, appends from two driver JVMs could collide and
  * the delete-before-rename below would clobber the first's file);
  * streaming passes an (epoch, partition)-deterministic name so an
  * epoch REPLAY overwrites its own files instead of duplicating them.
  */
/** Read-snapshot guard for commits whose CONTENT was derived from
  * reading the table (row-level rewrites, compaction): `scanDels` =
  * the position-delete manifest names active when the operation READ,
  * `readRels` = the rel paths it read. A commit must abort when the
  * base snapshot has since gained a delete manifest touching any file
  * the operation read — MOR commits never retire files, so the
  * retired-files-live check cannot see them, and committing anyway
  * would resurrect the newly-deleted rows in the rewritten files (or
  * duplicate a concurrently-updated row's post-image).
  */
private[graft] case class SinkReadSnapshot(scanDels: Set[String],
                                           readRels: Set[String])

/** Thread-local carrier for derived commits that flow through the
  * PUBLIC write API (compaction = a dynamic partition overwrite driven
  * by a read of the same table): the V2 write exec commits driver-side
  * on the calling thread, so the maintenance op arms the guard around
  * its action. Row-level commits pass their snapshot explicitly.
  */
private[graft] object SinkGuard {
  private[sources] val current = new ThreadLocal[Option[SinkReadSnapshot]] {
    override def initialValue(): Option[SinkReadSnapshot] = None
  }

  def snapshot(scanDels: Set[String], readRels: Set[String]): SinkReadSnapshot =
    SinkReadSnapshot(scanDels, readRels)

  def armed[A](snap: Option[SinkReadSnapshot])(f: => A): A = {
    current.set(snap)
    try f finally current.set(None)
  }
}

private object SinkCommit {
  def fsFor(path: String): FileSystem =
    FileSystem.get(new java.net.URI(path),
      org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration)

  /** Throw when `baseDels` gained a manifest (vs the operation's scan
    * snapshot) that deletes positions in any file the operation read.
    */
  private def checkDeleteConflicts(fs: FileSystem, path: String,
                                   baseDels: Seq[String],
                                   snap: SinkReadSnapshot): Unit = {
    if (snap.readRels.isEmpty) return
    val conflicting = baseDels.filterNot(snap.scanDels).filter { m =>
      SinkDeletes.read(fs, new Path(path, s"_deletes/$m"))
        .exists { case (rel, _) => snap.readRels(rel) }
    }
    if (conflicting.nonEmpty)
      throw new java.util.ConcurrentModificationException(
        s"rewrite of $path conflicts with a concurrent merge-on-read " +
          s"commit: position-delete manifest(s) " +
          s"${conflicting.take(3).mkString(", ")} landed after this " +
          "operation read — its output was computed without those " +
          "deletes; retry against current data")
  }

  /** Position-delete manifest GC at commit time: a carried-forward
    * manifest none of whose rel paths survive in the NEXT snapshot's
    * file set can no longer affect any scan of that snapshot — drop it
    * from the headers so per-split manifest lists stay bounded and
    * vacuum can reclaim the file once older snapshots expire.
    */
  private def liveDeleteManifests(fs: FileSystem, path: String,
                                  dels: Seq[String],
                                  nextRels: Set[String]): Seq[String] =
    dels.filter { m =>
      SinkDeletes.read(fs, new Path(path, s"_deletes/$m"))
        .exists { case (rel, _) => nextRels(rel) }
    }

  def publish(fs: FileSystem, path: String, partCols: Seq[String],
              mode: SinkMode, files: Seq[StagedFile],
              destName: StagedFile => String,
              statsToken: String, versioned: Boolean = false): Unit = {
    // versioning is sticky: once a table has manifests, every publish
    // maintains them, whatever write path reached it
    val vMode = versioned || SinkVersions.isVersioned(fs, path)
    // which partition TUPLES must be cleared, as a predicate (an
    // OverwriteEq over a strict subset of the columns matches many
    // leaves; Dynamic matches exactly the tuples being published)
    val dynamicTuples: Set[Seq[String]] =
      if (mode == Dynamic) files.map(_.partValues).toSet else Set.empty
    val clearMatch: Seq[String] => Boolean = mode match {
      case Append => _ => false
      case Truncate => _ => true
      case OverwriteEq(eqs) => values =>
        eqs.forall { case (c, want) =>
          values(partCols.indexOf(c)) == want }
      case Dynamic => values => dynamicTuples(values)
    }
    // versioned tables never physically delete at publish: retired
    // files just drop out of the next manifest (old versions keep
    // reading them until vacuumVersions reclaims)
    if (!vMode && mode != Append) {
      val root = new Path(path)
      SinkLayout.listLeaves(fs, root, partCols)
        .filter { case (values, _) => clearMatch(values) }
        .foreach { case (_, leaf) => SinkLayout.deleteLeaf(fs, root, leaf) }
    }
    files.foreach { f =>
      val dest = new Path(path, SinkLayout.leafRel(partCols, f.partValues))
      fs.mkdirs(dest)
      val src = new Path(f.stagedPath)
      val target = new Path(dest, destName(f))
      fs.delete(target, false) // streaming replay: same target name
      if (!fs.rename(src, target))
        throw new java.io.IOException(s"publish rename failed for $src")
    }
    // stats AFTER the data renames: a crash here leaves published files
    // without stats — scanned instead of skipped, degraded never wrong
    files.groupBy(_.partValues).foreach { case (values, fsOfV) =>
      val dir = new Path(path, SinkLayout.leafRel(partCols, values))
      SinkStats.write(fs, dir, statsToken,
        fsOfV.map(f => (destName(f), Some(f.rows), f.stats)))
      SinkBlooms.write(fs, dir, statsToken,
        fsOfV.map(f => (destName(f), f.blooms)))
    }
    if (vMode) {
      // next snapshot = previous minus cleared partitions plus this
      // publish, keyed by relative path (a streaming crash-replay that
      // re-published the same deterministic names replaces, not
      // duplicates). Manifest LAST: a crash before this line leaves
      // the data renamed but unreferenced — invisible to every
      // manifest-driven reader, reclaimed by vacuum; never a torn read.
      // CAS loop: concurrent publishers race on the version number —
      // a taken slot (tryWrite false) means another snapshot landed
      // first; recompute from ITS state and try the next number, so
      // neither publisher's files are lost
      val fresh = files.map { f =>
        (s"${SinkLayout.leafRel(partCols, f.partValues)}/${destName(f)}",
          f.partValues)
      }
      var committed = false
      var attempts = 0
      while (!committed) {
        attempts += 1
        if (attempts > 100) throw new java.io.IOException(
          s"version manifest commit lost the CAS race 100 times: $path")
        val base = SinkVersions.latest(fs, path)
        // no prior manifest = versioning was just ENABLED: seed the
        // first snapshot from the directory listing, or a table with
        // pre-versioning history would lose its existing files to the
        // manifest-driven readers (the listing already includes this
        // publish's renamed files — the map union dedups them)
        val prev = base.map(SinkVersions.read(fs, path, _))
          .getOrElse(SinkVersions.listingEntries(fs, path, partCols))
        val kept = prev.filterNot { case (_, values) => clearMatch(values) }
        val next = (kept.toMap ++ fresh.toMap).toSeq.sortBy(_._1)
        // position-delete manifests CARRY FORWARD across ordinary
        // publishes (their rows stay deleted); a truncate clears them
        // with everything else; manifests whose every target file
        // retired with this publish GC out of the headers (they can no
        // longer affect any scan of the new snapshot).
        val carried =
          if (mode == Truncate) Seq.empty
          else base.map(SinkVersions.readDeletes(fs, path, _))
            .getOrElse(Seq.empty)
        // a derived commit (compaction) arms the thread-local guard:
        // abort when a merge-on-read delete landed on files it read
        // after it read them — its output lacks those deletes
        SinkGuard.current.get().foreach(snap =>
          checkDeleteConflicts(fs, path, carried, snap))
        val dels = liveDeleteManifests(fs, path, carried,
          next.map(_._1).toSet)
        committed = SinkVersions.tryWrite(fs, path, base.getOrElse(0L) + 1,
          next, dels)
      }
    }
  }

  /** FILE-GRAIN replace, the commit half of a row-level rewrite:
    * publish the fresh files (rename + stats, the normal protocol),
    * then retire EXACTLY `replaced` — always atomically, via the
    * manifest CAS (next = previous minus replaced plus fresh; a
    * concurrent publish keeps its files because the CAS recomputes
    * from the winner's state). A table that was not yet versioned is
    * UPGRADED by its first row-level commit: the seed snapshot is the
    * post-rewrite state (the directory listing at commit time minus
    * the replaced files plus the fresh ones), after which every
    * publish maintains manifests and reads are manifest-driven. The
    * alternative — physical delete after the renames — gave a racing
    * listing-based reader a transient-duplicate window; versioning is
    * the only publish that retires files atomically, so row-level ops
    * simply require it. Retired files stay on disk until
    * [[graft.ops.Compaction.vacuumVersions]] reclaims them.
    *
    * `newDeleteManifest` is the merge-on-read commit's position-delete
    * manifest (its name under `_deletes/`, plus the rel paths of the
    * data files it touches — those join the conflict check: a
    * concurrent rewrite of one means our positions are stale).
    * `changesDir` links a pre-written row-grain change directory (see
    * [[SinkVersions.readChangesDir]]) into the committed snapshot.
    *
    * Returns the committed version (None for the no-op commit).
    */
  def replacePublish(fs: FileSystem, path: String, partCols: Seq[String],
                     files: Seq[StagedFile],
                     replaced: Seq[(String, Seq[String], String)],
                     destName: StagedFile => String,
                     statsToken: String, versioned: Boolean,
                     newDeleteManifest: Option[(String, Seq[String])] = None,
                     changesDir: Option[String] = None,
                     readSnapshot: Option[SinkReadSnapshot] = None)
      : Option[Long] = {
    if (files.isEmpty && replaced.isEmpty && newDeleteManifest.isEmpty)
      return None
    val fresh = replaceStage(fs, path, partCols, files, destName, statsToken)
    replaceCommit(fs, path, partCols, fresh, replaced.map(_._1),
      newDeleteManifest, changesDir, readSnapshot)
  }

  /** First half of the replace: rename the staged files into the
    * layout and write their stats/bloom manifests. Returns the fresh
    * (relative path, partition tuple) entries. A crash after this
    * leaves renamed-but-unreferenced files — invisible to every
    * manifest-driven reader, reclaimed by vacuum. Split from the CAS
    * half so a commit can compute row-grain CHANGE FILES between the
    * two (the fresh files are readable in their final partitioned
    * locations, but nothing references them yet).
    */
  def replaceStage(fs: FileSystem, path: String, partCols: Seq[String],
                   files: Seq[StagedFile], destName: StagedFile => String,
                   statsToken: String): Seq[(String, Seq[String])] = {
    files.foreach { f =>
      val dest = new Path(path, SinkLayout.leafRel(partCols, f.partValues))
      fs.mkdirs(dest)
      val src = new Path(f.stagedPath)
      val target = new Path(dest, destName(f))
      fs.delete(target, false)
      if (!fs.rename(src, target))
        throw new java.io.IOException(s"replace-publish rename failed for $src")
    }
    files.groupBy(_.partValues).foreach { case (values, fsOfV) =>
      val dir = new Path(path, SinkLayout.leafRel(partCols, values))
      SinkStats.write(fs, dir, statsToken,
        fsOfV.map(f => (destName(f), Some(f.rows), f.stats)))
      SinkBlooms.write(fs, dir, statsToken,
        fsOfV.map(f => (destName(f), f.blooms)))
    }
    files.map { f =>
      (s"${SinkLayout.leafRel(partCols, f.partValues)}/${destName(f)}",
        f.partValues)
    }
  }

  /** Second half: the CAS manifest commit retiring `retiredSeq` and
    * adding `fresh` — see [[replacePublish]] for the contract.
    */
  def replaceCommit(fs: FileSystem, path: String, partCols: Seq[String],
                    fresh: Seq[(String, Seq[String])],
                    retiredSeq: Seq[String],
                    newDeleteManifest: Option[(String, Seq[String])] = None,
                    changesDir: Option[String] = None,
                    readSnapshot: Option[SinkReadSnapshot] = None): Option[Long] = {
    val retired = retiredSeq.toSet
    var committed: Option[Long] = None
    var attempts = 0
    while (committed.isEmpty) {
      attempts += 1
      if (attempts > 100) throw new java.io.IOException(
        s"replace manifest commit lost the CAS race 100 times: $path")
      val base = SinkVersions.latest(fs, path)
      // no prior manifest = the table's FIRST row-level commit upgrades
      // it to versioned: seed from the listing (which already includes
      // this publish's renamed files — the map union below dedups)
      val prev = base.map(SinkVersions.read(fs, path, _))
        .getOrElse(SinkVersions.listingEntries(fs, path, partCols))
      // WRITE-WRITE CONFLICT CHECK (the serializable guard Delta and
      // Iceberg apply): every file this rewrite read must still be
      // live in the snapshot we're replacing — a concurrent commit
      // that already replaced one means our kept-rows were computed
      // from stale data; committing anyway would duplicate the rows
      // both rewrites carried forward and drop the winner's edits.
      val prevSet = prev.map(_._1).toSet
      val mustBeLive = retired ++ newDeleteManifest.toSeq.flatMap(_._2)
      val gone = mustBeLive.filterNot(prevSet)
      if (gone.nonEmpty) throw new java.util.ConcurrentModificationException(
        s"row-level rewrite of $path conflicts with a concurrent commit: " +
          s"${gone.take(3).mkString(", ")} no longer in the latest snapshot" +
          " — retry the operation against current data")
      val baseDels = base.map(SinkVersions.readDeletes(fs, path, _))
        .getOrElse(Seq.empty)
      // the MOR half of the conflict check: a concurrent merge-on-read
      // commit retires no files, so `gone` cannot see it — compare the
      // base's delete manifests against the operation's READ snapshot
      readSnapshot.foreach(snap =>
        checkDeleteConflicts(fs, path, baseDels, snap))
      val kept = prev.filterNot { case (rel, _) => retired(rel) }
      val next = (kept.toMap ++ fresh.toMap).toSeq.sortBy(_._1)
      // GC carried manifests whose files all retired with this commit
      // (a COW rewrite FOLDS their deletes into the fresh files)
      val dels = liveDeleteManifests(fs, path, baseDels,
        next.map(_._1).toSet) ++ newDeleteManifest.map(_._1).toSeq
      val v = base.getOrElse(0L) + 1
      if (SinkVersions.tryWrite(fs, path, v, next, dels, changesDir))
        committed = Some(v)
    }
    committed
  }

  /** Delete `dir`, then remove each ancestor up to (and including)
    * `stopAt` while empty — keeps `_staging` from accumulating empty
    * query/epoch skeletons over a long-running stream.
    */
  def sweep(fs: FileSystem, dir: Path, stopAt: Path): Unit = {
    fs.delete(dir, true)
    var p = dir.getParent
    while (p != null && fs.exists(p) && fs.listStatus(p).isEmpty) {
      fs.delete(p, true)
      p = if (p == stopAt) null else p.getParent
    }
  }
}

private class PartitionedSinkBatchWrite(path: String, partCols: Seq[String],
                                        schema: StructType, queryId: String,
                                        mode: SinkMode,
                                        versioned: Boolean = false,
                                        props: Map[String, String] = Map.empty)
    extends BatchWrite {

  private def stagingDir = new Path(path, s"_staging/$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new PartitionedSinkWriterFactory(path, partCols, schema, queryId,
      PartitionedSinkWriterFactory.sessionConf(),
      SinkBloomConf.fromSession(props),
      SinkFormat.fromProps(props), SinkFormat.fieldIds(props),
      SinkParquetWrite.rowGroupBytesFromSession())

  // at most one committed attempt per task partition — the scheduler
  // half of exactly-once; the manifest publish below is the other half
  override def useCommitCoordinator(): Boolean = true

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = SinkCommit.fsFor(path)
    val files = messages.collect { case m: SinkCommitMessage => m.files }.flatten
    // publish exactly the manifest-listed files; a zombie attempt's
    // orphan staging file is NOT in any commit message and is swept
    // with the staging dir below.
    // The published name carries a QUERY-UNIQUE token: the staged name
    // alone is part-<partitionId>-<taskId>-<tuple>.tsv, and Spark's
    // task ids restart at 0 per APPLICATION — two appends from
    // different driver JVMs can mint the same (partitionId, taskId)
    // pair, and publish's delete-before-rename (needed for streaming
    // epoch replay) would silently clobber the first app's file. The
    // queryId prefix makes batch names globally unique, so an append
    // can never overwrite another append's data.
    val qTok = queryId.replaceAll("[^0-9a-zA-Z]", "").take(8)
    SinkCommit.publish(fs, path, partCols, mode, files.toSeq,
      f => s"part-$qTok-" +
        new Path(f.stagedPath).getName.stripPrefix("part-"),
      statsToken = queryId, versioned = versioned)
    sweepStaging(fs)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // all-or-nothing: staged data vanishes, the published layout is
    // exactly what it was before the job
    sweepStaging(SinkCommit.fsFor(path))
  }

  /** Remove this query's staging dir, and the `_staging` parent when
    * this was its last query (a zero-row job never creates either —
    * both probes are existence-guarded).
    */
  private def sweepStaging(fs: FileSystem): Unit = {
    fs.delete(stagingDir, true)
    val stagingParent = stagingDir.getParent
    if (fs.exists(stagingParent) && fs.listStatus(stagingParent).isEmpty)
      fs.delete(stagingParent, true)
  }
}

private object PartitionedSinkWriterFactory {
  /** The SESSION's Hadoop configuration, serialized for the executors:
    * a task-side `new Configuration()` would drop per-session FS
    * settings (s3a credentials, defaultFS overrides) that the
    * driver-side publish sees — inconsistent on any non-local FS.
    * Called on the driver at factory-creation time.
    */
  def sessionConf(): org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
}

private class PartitionedSinkWriterFactory(
    path: String, partCols: Seq[String], schema: StructType, queryId: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    bloom: (Seq[String], Double, Int) = (Seq.empty, 0.01, 131072),
    format: String = SinkFormat.Tsv,
    fieldIds: Map[String, Int] = Map.empty,
    rowGroupBytes: Long =
      org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PartitionedSinkWriter(path, partCols, schema, queryId, partitionId,
      taskId, conf, bloom, format, fieldIds, rowGroupBytes)
}

/** Task-side writer: buffers one open staged file per partition TUPLE
  * seen (the incoming rows need not be clustered by the partition
  * columns), stages under `_staging/<stagingSub>/` (query dir for batch,
  * query/epoch dir for streaming), and reports its files in the commit
  * message. abort() deletes everything it staged.
  */
private class PartitionedSinkWriter(path: String, partCols: Seq[String],
                                    schema: StructType, stagingSub: String,
                                    partitionId: Int, taskId: Long,
                                    conf: org.apache.spark.util.SerializableConfiguration,
                                    bloom: (Seq[String], Double, Int) =
                                      (Seq.empty, 0.01, 131072),
                                    format: String = SinkFormat.Tsv,
                                    fieldIds: Map[String, Int] = Map.empty,
                                    rowGroupBytes: Long =
                                      org.apache.parquet.hadoop.ParquetWriter
                                        .DEFAULT_BLOCK_SIZE.toLong)
    extends DataWriter[InternalRow] {

  private val fs = FileSystem.get(new java.net.URI(path), conf.value)
  private val partIdxs: Array[Int] = partCols.map(schema.fieldIndex).toArray
  private val partIdxSet = partIdxs.toSet
  private val dataFields = schema.fields.zipWithIndex
    .filter { case (_, i) => !partIdxSet.contains(i) }

  private val (bloomCols, bloomFpp, bloomMaxDistinct) = bloom
  /** (column name, schema ordinal, string?) per bloom-enabled column
    * present in the data fields with an eligible type.
    */
  private val bloomPlan: Array[(String, Int, Boolean)] =
    dataFields.collect {
      case (fld, i) if bloomCols.contains(fld.name) &&
        SinkBloomConf.eligible(fld.dataType) =>
        (fld.name, i, fld.dataType == StringType)
    }

  /** Distinct values of one bloom column within one file, bounded by
    * count (and cumulative bytes for strings). Overflow drops the
    * filter — a file-column without a bloom is scanned, never wrong.
    */
  private final class BloomAcc(isString: Boolean) {
    private val seen = new java.util.HashSet[Any]()
    private var strBytes = 0L
    var over = false
    def add(row: InternalRow, i: Int): Unit = if (!over) {
      val v: Any =
        if (isString) row.getUTF8String(i).toString
        else schema.fields(i).dataType match {
          case LongType    => row.getLong(i)
          case IntegerType => row.getInt(i).toLong
          case ShortType   => row.getShort(i).toLong
          case ByteType    => row.getByte(i).toLong
          case _           => return
        }
      if (seen.add(v)) {
        if (isString) strBytes += v.asInstanceOf[String].length
        if (seen.size > bloomMaxDistinct ||
          strBytes > SinkBloomConf.MaxStringBytes) { over = true; seen.clear() }
      }
    }
    def render: Option[Array[Byte]] =
      if (over || seen.isEmpty) None
      else {
        val bf = org.apache.spark.util.sketch.BloomFilter
          .create(seen.size.toLong, bloomFpp)
        seen.forEach {
          case l: java.lang.Long => bf.putLong(l)
          case s: String => bf.putString(s)
          case _ => ()
        }
        val out = new java.io.ByteArrayOutputStream()
        bf.writeTo(out)
        Some(out.toByteArray)
      }
  }

  /** Running min/max over one file's non-null values of one column.
    * `addFrom` pulls the typed value straight off the row; `render`
    * answers None = no stats (poisoned), Some(None) = all values NULL,
    * Some(Some(bounds)) = a usable range.
    */
  private sealed abstract class ColAcc {
    def addFrom(row: InternalRow, i: Int): Unit
    def render: Option[Option[(String, String)]]
  }

  /** NUMERIC accumulator. Integrals accumulate as Long (exact),
    * floatings as Double; a NaN/±Inf poisons the column for the file
    * (no stats emitted — non-finite values have no usable ordering for
    * range skipping).
    *
    * Rendering precision matters for CORRECTNESS, not cosmetics: the
    * skip side compares these strings as BigDecimals against the
    * pushed filter literal's toString, which for a Float renders at
    * FLOAT precision ("0.1"), while the same value widened to Double
    * renders at double precision ("0.10000000149011612"). Mixing the
    * two reprs of one float makes `0.1 < 0.100000001…` "provable" and
    * wrongly skips a file whose every row EQUALS the literal — so a
    * float column's bounds are rendered back at float precision
    * (widening is exact; `.toFloat` restores the original bits).
    */
  private final class NumStat(dt: DataType) extends ColAcc {
    private val floating = dt == DoubleType || dt == FloatType
    private val isFloat = dt == FloatType
    var any = false; var poisoned = false
    var minL = Long.MaxValue; var maxL = Long.MinValue
    var minD = Double.PositiveInfinity; var maxD = Double.NegativeInfinity
    def addL(v: Long): Unit = {
      any = true; if (v < minL) minL = v; if (v > maxL) maxL = v }
    def addD(v: Double): Unit =
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
        poisoned = true
      else { any = true; if (v < minD) minD = v; if (v > maxD) maxD = v }
    override def addFrom(row: InternalRow, i: Int): Unit = dt match {
      case LongType    => addL(row.getLong(i))
      case IntegerType => addL(row.getInt(i).toLong)
      case ShortType   => addL(row.getShort(i).toLong)
      case ByteType    => addL(row.getByte(i).toLong)
      case DoubleType  => addD(row.getDouble(i))
      case FloatType   => addD(row.getFloat(i).toDouble)
      case _           => ()
    }
    override def render: Option[Option[(String, String)]] =
      if (poisoned) None
      else if (!any) Some(None)
      else Some(Some(
        if (isFloat) (minD.toFloat.toString, maxD.toFloat.toString)
        else if (floating) (minD.toString, maxD.toString)
        else (minL.toString, maxL.toString)))
  }

  /** STRING accumulator: truncated prefix bounds ([[SinkStrBounds]]).
    * Tracks ONLY the 16-code-point prefixes (a document-sized value
    * never parks megabytes in writer state — prefix truncation is
    * monotone under binary order, so min/max of prefixes ARE the
    * prefixes of min/max), plus whether the current max holder was
    * cut (the increment decision). A prefix containing a lone
    * surrogate poisons the column for the file.
    */
  private final class StrStat extends ColAcc {
    var any = false; var poisoned = false
    private var minT: String = _
    private var maxT: String = _
    private var maxCut = false
    override def addFrom(row: InternalRow, i: Int): Unit =
      if (!poisoned) SinkStrBounds.truncate(row.getUTF8String(i).toString) match {
        case None => poisoned = true
        case Some((t, cut)) =>
          if (!any) { any = true; minT = t; maxT = t; maxCut = cut }
          else {
            if (SinkStrBounds.cmp(t, minT) < 0) minT = t
            val c = SinkStrBounds.cmp(t, maxT)
            if (c > 0) { maxT = t; maxCut = cut }
            // a prefix TIE with a cut value: the longer value is the
            // real max — the bound must increment
            else if (c == 0 && cut) maxCut = true
          }
      }
    override def render: Option[Option[(String, String)]] =
      if (poisoned) None
      else if (!any) Some(None)
      else SinkStrBounds.upperBound(maxT, maxCut).map(up => Some((minT, up)))
  }

  /** Aligned with dataFields; null for unsupported types (no stats). */
  private def newStats(): Array[ColAcc] = dataFields.map { case (fld, _) =>
    fld.dataType match {
      case LongType | IntegerType | ShortType | ByteType |
           DoubleType | FloatType => new NumStat(fld.dataType)
      case StringType => new StrStat
      case _ => null
    }
  }

  /** Format seam: the one per-row encode call the two formats differ
    * in. Everything around it — staging paths, stats/bloom
    * accumulation, the commit message — is format-independent.
    */
  private sealed trait RowOut {
    def write(row: InternalRow): Unit
    def close(): Unit
  }

  private final class TsvRowOut(w: java.io.BufferedWriter) extends RowOut {
    override def write(row: InternalRow): Unit = {
      w.write(dataFields.map { case (fld, i) => fieldStr(row, i, fld.dataType) }
        .mkString("\t"))
      w.write("\n")
    }
    override def close(): Unit = w.close()
  }

  private final class ParquetRowOut(
      pw: org.apache.parquet.hadoop.ParquetWriter[InternalRow])
      extends RowOut {
    override def write(row: InternalRow): Unit = pw.write(row)
    override def close(): Unit = pw.close()
  }

  private def newRowOut(f: Path): RowOut =
    if (format == SinkFormat.Parquet)
      new ParquetRowOut(SinkParquetWrite.open(conf.value, f,
        dataFields.toSeq, fieldIds, rowGroupBytes))
    else {
      fs.mkdirs(f.getParent)
      new TsvRowOut(new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(fs.create(f, true), "UTF-8")))
    }

  private final class OpenOut(val w: RowOut, val p: Path,
                              var rows: Long,
                              val stats: Array[ColAcc],
                              val blooms: Array[BloomAcc])

  private val open = scala.collection.mutable.Map[Seq[String], OpenOut]()

  /** Data-cell rendering: strings go through the TsvCodec escape so
    * delimiter bytes / the NULL token / the empty string round-trip;
    * the PARTITION values are read with [[rawStr]] instead (the
    * manifest carries them raw; paths escape them at construction).
    */
  private def fieldStr(row: InternalRow, i: Int, dt: DataType): String = {
    if (row.isNullAt(i)) PartitionedSink.NullToken
    else dt match {
      case StringType  => TsvCodec.escape(row.getUTF8String(i).toString)
      case LongType    => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType  => row.getDouble(i).toString
      case FloatType   => row.getFloat(i).toString
      case BooleanType => row.getBoolean(i).toString
      case ShortType   => row.getShort(i).toString
      case ByteType    => row.getByte(i).toString
      case other => throw new UnsupportedOperationException(
        s"PartitionedSink supports atomic column types only, got $other")
    }
  }

  /** Raw (unescaped) rendering for a partition value. */
  private def rawStr(row: InternalRow, i: Int, dt: DataType): String = dt match {
    case StringType => row.getUTF8String(i).toString
    case other      => fieldStr(row, i, other)
  }

  override def write(row: InternalRow): Unit = {
    val pvs: Seq[String] = partIdxs.toSeq.map { i =>
      require(!row.isNullAt(i),
        s"NULL partition value in ${schema.fields(i).name}")
      rawStr(row, i, schema.fields(i).dataType)
    }
    val o = open.getOrElseUpdate(pvs, {
      val f = new Path(path,
        s"_staging/$stagingSub/part-$partitionId-$taskId-" +
          s"${SinkLayout.valueTag(pvs)}.${SinkFormat.extension(format)}")
      fs.mkdirs(f.getParent)
      new OpenOut(newRowOut(f), f, 0L, newStats(),
        bloomPlan.map { case (_, _, isStr) => new BloomAcc(isStr) })
    })
    o.w.write(row)
    o.rows += 1
    var j = 0
    while (j < dataFields.length) {
      val st = o.stats(j)
      if (st != null) {
        val i = dataFields(j)._2
        if (!row.isNullAt(i)) st.addFrom(row, i)
      }
      j += 1
    }
    var b = 0
    while (b < bloomPlan.length) {
      val i = bloomPlan(b)._2
      if (!row.isNullAt(i)) o.blooms(b).add(row, i)
      b += 1
    }
  }

  override def commit(): WriterCommitMessage = {
    val files = open.map { case (pvs, o) =>
      o.w.close()
      val colStats = dataFields.zip(o.stats).flatMap { case ((fld, _), st) =>
        if (st == null) None
        else st.render.map(mm => SinkColStat(fld.name, mm))
      }.toSeq
      val colBlooms = bloomPlan.zip(o.blooms).flatMap {
        case ((name, _, _), acc) => acc.render.map(name -> _)
      }.toSeq
      StagedFile(pvs, o.p.toString, o.rows, partitionId, colStats, colBlooms)
    }.toSeq
    open.clear()
    SinkCommitMessage(files)
  }

  override def abort(): Unit = {
    open.values.foreach { o =>
      try o.w.close() catch { case _: Throwable => () }
      try fs.delete(o.p, false) catch { case _: Throwable => () }
    }
    open.clear()
  }

  override def close(): Unit =
    open.values.foreach { o =>
      try o.w.close() catch { case _: Throwable => () }
    }
}

/** Streaming half of the sink: per-epoch exactly-once on top of the
  * same stage-then-publish protocol. Two mechanisms compose:
  *
  *   - DETERMINISTIC TARGET NAMES: epoch e's files publish as
  *     `part-e<e>-p<partitionId>-<tuple>.tsv` — a REPLAYED epoch (the
  *     checkpoint committed the sink write but crashed before the
  *     offset commit, so Spark re-runs the batch) overwrites its own
  *     files instead of appending duplicates. This holds because a
  *     replay recomputes the same rows into the same partition layout
  *     from the same checkpointed offsets.
  *   - COMMIT MARKERS: `_commits/epoch-<e>` is written after publish;
  *     a replay that finds its marker skips the publish entirely
  *     (cheap, and also protects Truncate/complete-mode replays from
  *     re-clearing newer data if epochs could ever interleave).
  *
  * Modes map to streaming output modes: Append = append,
  * Truncate = complete (each epoch replaces the whole layout),
  * Dynamic = per-partition replace (the update-mode rendition for a
  * partition-grained sink).
  */
private class PartitionedSinkStreamingWrite(path: String, partCols: Seq[String],
                                            schema: StructType, queryId: String,
                                            mode: SinkMode,
                                            versioned: Boolean = false,
                                            props: Map[String, String] =
                                              Map.empty)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private def marker(epochId: Long) = new Path(path, s"_commits/epoch-$epochId")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new PartitionedSinkStreamingWriterFactory(path, partCols, schema, queryId,
      PartitionedSinkWriterFactory.sessionConf(),
      SinkBloomConf.fromSession(props),
      SinkFormat.fromProps(props), SinkFormat.fieldIds(props),
      SinkParquetWrite.rowGroupBytesFromSession())

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val fs = SinkCommit.fsFor(path)
    val files = messages.collect { case m: SinkCommitMessage => m.files }.flatten
    if (!fs.exists(marker(epochId))) {
      SinkCommit.publish(fs, path, partCols, mode, files.toSeq,
        f => s"part-e$epochId-p${f.partitionId}-" +
          s"${SinkLayout.valueTag(f.partValues)}" +
          // deterministic name, staged extension (format-dependent)
          f.stagedPath.substring(f.stagedPath.lastIndexOf('.')),
        statsToken = s"e$epochId", versioned = versioned)
      fs.mkdirs(marker(epochId).getParent)
      fs.create(marker(epochId), true).close()
    }
    SinkCommit.sweep(fs, new Path(path, s"_staging/$queryId/epoch-$epochId"),
      new Path(path, "_staging"))
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val fs = SinkCommit.fsFor(path)
    SinkCommit.sweep(fs, new Path(path, s"_staging/$queryId/epoch-$epochId"),
      new Path(path, "_staging"))
  }
}

private class PartitionedSinkStreamingWriterFactory(
    path: String, partCols: Seq[String], schema: StructType, queryId: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    bloom: (Seq[String], Double, Int) = (Seq.empty, 0.01, 131072),
    format: String = SinkFormat.Tsv,
    fieldIds: Map[String, Int] = Map.empty,
    rowGroupBytes: Long =
      org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new PartitionedSinkWriter(path, partCols, schema,
      s"$queryId/epoch-$epochId", partitionId, taskId, conf, bloom,
      format, fieldIds, rowGroupBytes)
}
