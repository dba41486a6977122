package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** ROW-LEVEL operations on sink tables — SQL `DELETE FROM`, `UPDATE`
  * and `MERGE INTO` through Spark's group-based (copy-on-write)
  * row-level API ([[org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]];
  * the rewrite machinery is Catalyst's own `RewriteDeleteFromTable` /
  * `RewriteUpdateTable` / `RewriteMergeIntoTable` → `ReplaceData`
  * plans — the engine supplies only the two connector halves those
  * rules need, which is the whole point of doing this Spark-first):
  *
  *   - a COW SCAN over the table whose job is to read ALL rows of the
  *     file GROUPS that may contain matches (Catalyst puts the
  *     keep/transform logic ON TOP — the pushed condition must prune
  *     whole groups only, never rows, or rewritten files would lose
  *     their non-matching rows). The sink's existing pushdown already
  *     has exactly that shape: partition pruning and min/max file
  *     skipping drop only files PROVABLY free of matches, and every
  *     filter stays residual. On top of the static pruning, the scan
  *     implements runtime group filtering
  *     ([[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]
  *     on the `_file` metadata column): Catalyst runs the matching-row
  *     subquery first and hands the scan the distinct files that
  *     actually contain matches, so at 100 TB a DELETE touching one
  *     hour of one day rewrites exactly that hour's files — the
  *     difference between a surgical commit and rewriting a partition.
  *   - a REPLACE write: the kept/updated/inserted rows stage and
  *     publish through the sink's normal stage-then-publish protocol,
  *     and the commit retires EXACTLY the files the scan planned —
  *     ALWAYS atomically, via the version-manifest CAS (next manifest
  *     = previous minus replaced plus fresh; time travel and
  *     [[graft.ops.Compaction.tableChanges]] see the rewrite as
  *     delete+insert of those files). A table that was not yet
  *     versioned is UPGRADED by its first row-level commit (seed
  *     snapshot = the post-rewrite state): physical retirement would
  *     give racing readers a transient-duplicate window, so the
  *     atomic publish is simply required, not optional.
  *
  * Partition-grain deletes never reach this path: the table also
  * implements [[org.apache.spark.sql.connector.catalog.SupportsDelete]],
  * and Catalyst's `OptimizeMetadataOnlyDeleteFromTable` turns a
  * DELETE whose predicates are partition-column equalities into a
  * metadata-only leaf drop (no data read, no rewrite).
  *
  * The reference has no row-level surface at all (its warehouse
  * corrections are whole-partition `INSERT OVERWRITE`,
  * load_fct_flights.py:112-116) — this is extension surface, the
  * operation a real lake user hits the first week ("GDPR-delete these
  * doc_ids", "backfill this column for March").
  */
private[graft] object SinkMeta {
  /** Name of the file-path metadata column (Iceberg's `_file` shape). */
  final val FileCol = "_file"

  /** Name of the row-position metadata column (Iceberg's `_pos`
    * shape): the row's STABLE position within its data file — byte
    * offset of the line for TSV files, file-level row index for
    * parquet. (file, pos) is the row identity merge-on-read deletes
    * key on; stability holds because published files are immutable.
    */
  final val PosCol = "_pos"

  object FileMetaCol extends MetadataColumn {
    override def name(): String = FileCol
    override def dataType(): DataType = StringType
    override def isNullable: Boolean = false
    override def comment(): String =
      "path of the data file the row was read from"
  }

  object PosMetaCol extends MetadataColumn {
    override def name(): String = PosCol
    override def dataType(): DataType = org.apache.spark.sql.types.LongType
    override def isNullable: Boolean = false
    override def comment(): String =
      "stable position of the row within its data file"
  }
}

/** One row-level operation instance: Catalyst calls `newScanBuilder`
  * and `newWriteBuilder` on the SAME instance, which is the designed
  * coordination channel — the scan records the file groups it planned
  * (post static pruning AND post runtime group filtering), the write's
  * commit replaces exactly those files.
  */
private[sources] class SinkRowLevelOperation(
    path: String, partCols: Seq[String], fullSchema: StructType,
    versioned: Boolean, cmd: RowLevelOperation.Command,
    props: Map[String, String] = Map.empty)
    extends RowLevelOperation {

  /** (relative path, leaf values, absolute path) of every file group
    * the COW scan planned — "last planning wins", matching the plan
    * that actually executes.
    */
  @volatile private[sources] var plannedGroups
      : Seq[(String, Seq[String], String)] = Seq.empty

  /** Position-delete manifest NAMES active in the snapshot the scan
    * read (None until planning ran): the commit compares the base
    * snapshot's manifests against these — a manifest that landed
    * in between and touches a file this operation read is a
    * write-write conflict the retired-files check cannot see (MOR
    * commits retire nothing).
    */
  @volatile private[sources] var scanDeleteManifests: Option[Set[String]] = None

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"SinkRowLevelOperation($cmd on $path)"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(SinkMeta.FileCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new SinkCowScanBuilder(path, partCols, fullSchema, this,
      SinkFormat.fieldIds(props))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // the replace write must carry every table column (partition
    // columns route rows to leaves; data columns define the cell
    // order) — and in TABLE order, because the TSV layout is
    // positional and the readers decode by the table schema's
    // ordinals. Catalyst's ReplaceDataProjections provides exactly
    // that; this guard turns any drift into a loud error instead of
    // silently transposed cells.
    val names = info.schema().fields.map(_.name).toSeq
    val expected = fullSchema.fields.map(_.name).toSeq
    require(names == expected,
      s"row-level write schema $names must match table schema $expected")
    new WriteBuilder {
      override def build(): Write = new Write
          with RequiresDistributionAndOrdering {
        // CLUSTER the rewrite on the partition tuple: without this the
        // kept rows arrive in whatever task layout the rewrite query
        // had, and each task opens a file per tuple it touches — a
        // DELETE over K files in T tasks would fragment the rewritten
        // partitions into up to K·T files. Clustering lands each tuple
        // in few tasks (AQE sizes the exchange), so a rewrite leaves
        // the layout no more fragmented than it found it. Not strictly
        // required: on a single-partition rewrite Spark may skip the
        // exchange entirely.
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          org.apache.spark.sql.connector.distributions.Distributions
            .clustered(partCols.map(c =>
              Expressions.identity(c)
                : org.apache.spark.sql.connector.expressions.Expression)
              .toArray)
        override def distributionStrictlyRequired(): Boolean = false
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
        override def toBatch: BatchWrite =
          new SinkReplaceBatchWrite(path, partCols, info.schema(),
            info.queryId(), versioned, SinkRowLevelOperation.this, props)
      }
    }
  }
}

private[sources] class SinkCowScanBuilder(
    path: String, partCols: Seq[String], fullSchema: StructType,
    op: SinkRowLevelOperation, fieldIds: Map[String, Int] = Map.empty)
    extends PartitionedSinkScanBuilder(path, partCols, fullSchema,
      fieldIds = fieldIds) {
  override def build(): org.apache.spark.sql.connector.read.Scan =
    new SinkCowScan(path, partCols, fullSchema, requiredSchema,
      pushedPartitionFilters, pushedSkipFilters, op, fieldIds)
}

/** The COW scan: the base class contributes static group pruning
  * (partition subtrees + min/max file skipping — both prune only
  * provably-match-free files, which is the exact soundness a
  * group-pruning scan needs); this subclass adds runtime group
  * filtering on `_file` and records the final planned groups into the
  * operation. Output partitioning is NOT declared (a runtime-filtered
  * subset's key grouping claim would mis-size the key-grouped plan,
  * and a rewrite query gains nothing from it).
  */
private[sources] class SinkCowScan(
    path: String, partCols: Seq[String], fullSchema: StructType,
    required: StructType, partitionFilters: Array[Filter],
    skipFilters: Array[Filter], op: SinkRowLevelOperation,
    fieldIds: Map[String, Int] = Map.empty)
    extends PartitionedSinkScan(path, partCols, fullSchema, required,
      partitionFilters, skipFilters, asOfVersion = None, fieldIds)
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  /** None until Catalyst's matching-row subquery runs; Some(files)
    * after — the groups that actually contain matching rows.
    */
  @volatile private var runtimeKeep: Option[Set[String]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(SinkMeta.FileCol))

  /** Runtime predicates arrive as V2 `IN`/`=` over `_file` with the
    * matching files as string literals. Unknown predicate shapes are
    * IGNORED (rewrite more groups than strictly needed — never fewer:
    * a group wrongly dropped here would resurrect its deleted rows).
    */
  override def filter(predicates: Array[Predicate]): Unit = {
    val sets = predicates.toSeq.flatMap(parseFileSet)
    if (sets.nonEmpty) runtimeKeep = Some(sets.reduce(_ intersect _))
  }

  private def parseFileSet(p: Predicate): Option[Set[String]] = {
    def refIsFile(e: org.apache.spark.sql.connector.expressions.Expression)
        : Boolean = e match {
      case r: NamedReference =>
        r.fieldNames.toSeq == Seq(SinkMeta.FileCol)
      case _ => false
    }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value match {
          case u: UTF8String => Some(u.toString)
          case s: String => Some(s)
          case _ => None
        }
      case _ => None
    }
    p.name() match {
      case "IN" if p.children().nonEmpty && refIsFile(p.children()(0)) =>
        val vals = p.children().drop(1).toSeq.map(lit)
        if (vals.forall(_.isDefined)) Some(vals.flatten.toSet) else None
      case "=" if p.children().length == 2 =>
        if (refIsFile(p.children()(0))) lit(p.children()(1)).map(Set(_))
        else if (refIsFile(p.children()(1))) lit(p.children()(0)).map(Set(_))
        else None
      case _ => None
    }
  }

  /** Post-runtime-filter group count, so the ReplaceData scan node's
    * `filesScanned` metric reflects what actually rewrites (the base
    * class counts only static pruning). None until planInputPartitions
    * has run — a metrics read before execution (an EXPLAIN-driven UI)
    * falls back to the base class's static count instead of reporting
    * a contradictory 0 next to populated skip counters.
    */
  @volatile private var groupsPlanned: Option[Long] = None

  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    super.reportDriverMetrics().map { m =>
      (m.name, groupsPlanned) match {
        case ("filesScanned", Some(n)) =>
          SinkScanMetrics.report("filesScanned" -> n).head
        case _ => m
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val groups = staticPrunedFiles.filter { case (_, f) =>
      runtimeKeep.forall(_.contains(f.getPath.toString))
    }
    groupsPlanned = Some(groups.size.toLong)
    op.plannedGroups = groups.map { case (values, f) =>
      (s"${SinkLayout.leafRel(partCols, values)}/${f.getPath.getName}",
        values, f.getPath.toString)
    }
    op.scanDeleteManifests = Some(activeDeleteManifests
      .map(p => new org.apache.hadoop.fs.Path(p).getName).toSet)
    // whole files, never byte-carved: a group must be read and
    // replaced as a unit, and carving would double-record it. The
    // splits carry the snapshot's position-delete manifests: a COW
    // rewrite of a file with MOR deletes FOLDS them in (the rewritten
    // file omits those rows; the stale positions retire with it).
    val keyTypes = partCols.map(c => fullSchema(c).dataType)
    groups.map { case (values, f) =>
      SinkFileSplit(f.getPath.toString, values, keyTypes,
        relPath = s"${SinkLayout.leafRel(partCols, values)}/${f.getPath.getName}",
        delManifests = activeDeleteManifests): InputPartition
    }.toArray
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
      staticPrunedFiles.size)

  /** NO row-group skipping on a group-based rewrite scan: the files it
    * plans must be read WHOLE — a skipped row group's non-matching
    * rows would silently vanish from the rewritten file. COLUMNAR when
    * every candidate group is parquet (decided on the STATIC set so
    * runtime filtering — a subset — can never break Spark's
    * all-or-nothing columnar requirement): the rewrite's read half
    * gets the vectorized decode, ColumnarToRow feeds the ReplaceData
    * projection, and merge-on-read positions fold via the reader's
    * batch-grain mask.
    */
  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    new PartitionedSinkReaderFactory(fullSchema, required, partCols,
      PartitionedSinkWriterFactory.sessionConf(), fieldIds,
      columnar = SinkParquetColumnar.enabledInSession() &&
        SinkParquetColumnar.schemaEligible(required) &&
        staticPrunedFiles.nonEmpty &&
        staticPrunedFiles.forall(_._2.getPath.getName.endsWith(".parquet")))
}

/** Row-grain change files for COW rewrites (`graft.rowChanges`):
  * `_changes/<dir>/<change_type>/part-*.parquet`, each file carrying
  * FULL table rows (partition columns inline — change files are not
  * partitioned). Computed as ONE Spark job between the replace's
  * rename and CAS halves: the replaced groups (tag +1) union the
  * fresh files (tag −1), hash-aggregate on the full row, and the NET
  * count per distinct row is the multiset difference both ways at
  * once — net>0 rows left (preimage/delete, with multiplicity), net<0
  * rows arrived (postimage/insert). Each side is read EXACTLY ONCE
  * (the old exceptAll-per-type rendition re-read both sides per
  * change type — up to 4 scans of the rewritten data on an UPDATE;
  * spec-pinned via SinkParquetIo). Reads go through the engine's own
  * split readers ([[SinkSplitsRead]]), so the before side resolves
  * renamed columns by FIELD ID and anti-filters the snapshot's
  * merge-on-read position deletes — a table mixing deleteMode streams
  * the exact live-row delta, and a post-rename table streams correct
  * values for pre-rename files.
  *
  * MERGE labels stay 'delete'/'insert' at this grain: Spark's
  * group-based ReplaceData hands the connector only the final rows of
  * each group — no per-row operation labels reach the write path (a
  * matched-update and an unmatched-insert are indistinguishable
  * without the MERGE key, which the connector never sees). Delta CDF
  * separates them because its own rewrite job plans the labels; the
  * documented contract here is: DELETE → 'delete', UPDATE →
  * 'update_preimage'/'update_postimage', MERGE → 'delete'/'insert'.
  */
private[sources] object SinkCowChanges {
  def write(path: String, partCols: Seq[String], schema: StructType,
            oldGroups: Seq[(String, Seq[String], String)],
            fresh: Seq[(String, Seq[String])],
            cmd: RowLevelOperation.Command,
            qTok: String,
            fieldIds: Map[String, Int],
            scanDelManifests: Seq[String]): Option[String] = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.active
    val keyTypes = partCols.map(c => schema(c).dataType)
    // before = the replaced groups as the SCAN saw them: whole files,
    // anti-filtered through the snapshot's position-delete manifests
    val beforeSplits = oldGroups.map { case (rel, values, abs) =>
      SinkFileSplit(abs, values, keyTypes, relPath = rel,
        delManifests = scanDelManifests)
    }
    val afterSplits = fresh.map { case (rel, values) =>
      SinkFileSplit(new Path(path, rel).toString, values, keyTypes,
        relPath = rel)
    }
    def side(splits: Seq[SinkFileSplit], tag: Int) =
      SinkSplitsRead.dataFrame(spark, splits, schema, partCols, fieldIds)
        .withColumn("_side", lit(tag.toLong))
    val cols = schema.fieldNames.toSeq
    import org.apache.spark.sql.connector.write.RowLevelOperation.Command._
    val (goneLabel, arrivedLabel) = cmd match {
      case UPDATE => ("update_preimage", "update_postimage")
      case _ => ("delete", "insert")
    }
    val changes = side(beforeSplits, 1).unionAll(side(afterSplits, -1))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("_side")).as("_net"))
      .filter(col("_net") =!= 0L) // carried-forward rows cancel here
      .withColumn(SinkChangeFeed.ChangeTypeCol,
        when(col("_net") > 0, lit(goneLabel)).otherwise(lit(arrivedLabel)))
      // |net| > 1 = the row appeared with multiplicity; re-expand
      .withColumn("_dup",
        explode(sequence(lit(1L), abs(col("_net")))))
      .select(cols.map(col) :+ col(SinkChangeFeed.ChangeTypeCol): _*)
    val dirName = s"chg-$qTok-${java.util.UUID.randomUUID()}"
    val tmp = new Path(path, s"_changes/.tmp-$dirName")
    // ONE write, partitioned by change type; the hive-style
    // `_change_type=<t>` dirs rename to the feed's plain `<t>` layout
    changes.write.mode("overwrite")
      .partitionBy(SinkChangeFeed.ChangeTypeCol).parquet(tmp.toString)
    val fs = SinkCommit.fsFor(path)
    Option(fs.listStatus(tmp)).toSeq.flatten
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(SinkChangeFeed.ChangeTypeCol + "="))
      .foreach { st =>
        val plain = st.getPath.getName
          .stripPrefix(SinkChangeFeed.ChangeTypeCol + "=")
        if (!fs.rename(st.getPath, new Path(tmp, plain)))
          throw new java.io.IOException(
            s"change-type dir rename failed: ${st.getPath}")
      }
    val dest = new Path(path, s"_changes/$dirName")
    fs.mkdirs(dest.getParent)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"change-dir publish failed: $dest")
    Some(dirName)
  }
}

/** MERGE-ON-READ rendition of the row-level operation
  * (`graft.deleteMode = 'mor'`), through Spark's delta-based API
  * ([[SupportsDelta]] → Catalyst plans WriteDelta instead of
  * ReplaceData): matching rows arrive at the writer as per-row DELETE
  * operations carrying their (`_file`, `_pos`) identity; the commit
  * writes a POSITION-DELETE manifest instead of rewriting any group.
  * Updates are represented as delete+insert
  * (representUpdateAsDeleteAndInsert), so MERGE/UPDATE compose from
  * the same two primitives: inserts stage through the normal writer,
  * deletes accumulate as positions. The scale trade vs COW: a 1-row
  * delete writes O(1) bytes (the hot-file rewrite churn of a daily
  * GDPR trickle disappears), paid for by a small per-split manifest
  * read at scan time until `compact` folds the deletes in.
  */
private[sources] class SinkRowLevelDeltaOperation(
    path: String, partCols: Seq[String], fullSchema: StructType,
    versioned: Boolean, cmd: RowLevelOperation.Command,
    props: Map[String, String] = Map.empty)
    extends SinkRowLevelOperation(path, partCols, fullSchema, versioned,
      cmd, props)
    with org.apache.spark.sql.connector.write.SupportsDelta {

  override def description(): String =
    s"SinkRowLevelDeltaOperation($cmd on $path, merge-on-read)"

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(SinkMeta.FileCol),
    Expressions.column(SinkMeta.PosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes(): Array[NamedReference] = Array(
    Expressions.column(SinkMeta.FileCol),
    Expressions.column(SinkMeta.PosCol))

  override def newWriteBuilder(info: LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder = {
    // rowId projection ordinals, read from the declared schema rather
    // than assumed: (file, pos)
    val idSchema = info.rowIdSchema.orElseThrow(() =>
      new IllegalStateException("delta write without a rowId schema"))
    val fileOrd = idSchema.fieldIndex(SinkMeta.FileCol)
    val posOrd = idSchema.fieldIndex(SinkMeta.PosCol)
    // a pure DELETE projects no row schema (positions only); anything
    // carrying inserts/updates must match the table layout exactly
    val names = info.schema().fields.map(_.name).toSeq
    val expected = fullSchema.fields.map(_.name).toSeq
    require(names.isEmpty || names == expected,
      s"row-level write schema $names must match table schema $expected")
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        if (names.isEmpty)
          // delete-only: the incoming projection is (operation, rowId)
          // — no partition columns to cluster on, nothing staged
          new org.apache.spark.sql.connector.write.DeltaWrite {
            override def toBatch
                : org.apache.spark.sql.connector.write.DeltaBatchWrite =
              new SinkDeltaBatchWrite(path, partCols, info.schema(),
                info.queryId(), versioned, props, fileOrd, posOrd,
                cmd, SinkRowLevelDeltaOperation.this)
          }
        else new org.apache.spark.sql.connector.write.DeltaWrite
            with RequiresDistributionAndOrdering {
          // cluster INSERTED rows by partition tuple, same anti-
          // fragmentation trade as the COW rewrite
          override def requiredDistribution()
              : org.apache.spark.sql.connector.distributions.Distribution =
            org.apache.spark.sql.connector.distributions.Distributions
              .clustered(partCols.map(c =>
                Expressions.identity(c)
                  : org.apache.spark.sql.connector.expressions.Expression)
                .toArray)
          override def distributionStrictlyRequired(): Boolean = false
          override def requiredOrdering()
              : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            Array.empty
          override def toBatch
              : org.apache.spark.sql.connector.write.DeltaBatchWrite =
            new SinkDeltaBatchWrite(path, partCols, info.schema(),
              info.queryId(), versioned, props, fileOrd, posOrd,
              cmd, SinkRowLevelDeltaOperation.this)
        }
    }
  }
}

/** Per-task delta writer: inserts ride the ordinary staged-file
  * writer; deletes accumulate as (absolute file path, position) pairs
  * in the commit message. `update` never fires —
  * representUpdateAsDeleteAndInsert splits it upstream.
  */
private class SinkDeltaWriter(
    inner: DataWriter[InternalRow], fileOrd: Int, posOrd: Int)
    extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
  private val deletes =
    scala.collection.mutable.ArrayBuffer[(String, Long)]()

  override def insert(row: InternalRow): Unit = inner.write(row)

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    deletes += ((id.getUTF8String(fileOrd).toString, id.getLong(posOrd)))

  override def update(meta: InternalRow, id: InternalRow,
                      row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "updates are represented as delete+insert")

  override def commit(): WriterCommitMessage =
    SinkDeltaCommitMessage(
      inner.commit().asInstanceOf[SinkCommitMessage],
      deletes.toSeq)
  override def abort(): Unit = inner.abort()
  override def close(): Unit = inner.close()
}

private case class SinkDeltaCommitMessage(
    inserts: SinkCommitMessage,
    deletes: Seq[(String, Long)]) extends WriterCommitMessage

private class SinkDeltaWriterFactory(
    inner: Option[PartitionedSinkWriterFactory], fileOrd: Int, posOrd: Int)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] = {
    val innerWriter = inner
      .map(_.createWriter(partitionId, taskId))
      .getOrElse(new DataWriter[InternalRow] {
        override def write(row: InternalRow): Unit =
          throw new IllegalStateException(
            "delete-only delta write received an insert row")
        override def commit(): WriterCommitMessage =
          SinkCommitMessage(Seq.empty)
        override def abort(): Unit = ()
        override def close(): Unit = ()
      })
    new SinkDeltaWriter(innerWriter, fileOrd, posOrd)
  }
}

private class SinkDeltaBatchWrite(
    path: String, partCols: Seq[String], schema: StructType,
    queryId: String, versioned: Boolean, props: Map[String, String],
    fileOrd: Int, posOrd: Int, cmd: RowLevelOperation.Command,
    op: SinkRowLevelOperation)
    extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

  private def stagingDir = new Path(path, s"_staging/$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
    // pure DELETE (empty schema): no insert rows can arrive — the
    // factory stages nothing and only accumulates positions
    val innerFactory =
      if (schema.isEmpty) None
      else Some(new PartitionedSinkWriterFactory(path, partCols,
        schema, queryId, PartitionedSinkWriterFactory.sessionConf(),
        SinkBloomConf.fromSession(props),
        SinkFormat.fromProps(props), SinkFormat.fieldIds(props),
        SinkParquetWrite.rowGroupBytesFromSession()))
    new SinkDeltaWriterFactory(innerFactory, fileOrd, posOrd)
  }

  override def useCommitCoordinator(): Boolean = true

  /** Absolute data-file path → table-relative path: the leaf layout is
    * exactly `partCols.length` directories plus the file name.
    */
  private def relOf(abs: String): String = {
    val segs = abs.split("/").filter(_.nonEmpty)
    segs.takeRight(partCols.length + 1).mkString("/")
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = SinkCommit.fsFor(path)
    val deltas = messages.collect { case m: SinkDeltaCommitMessage => m }
    val files = deltas.flatMap(_.inserts.files).toSeq
    val deletes = deltas.flatMap(_.deletes).toSeq
      .map { case (abs, pos) => (relOf(abs), pos) }
    val qTok = queryId.replaceAll("[^0-9a-zA-Z]", "").take(8)
    val manifest =
      if (deletes.isEmpty) None
      else {
        val name = s"del-$qTok-${java.util.UUID.randomUUID()}.tsv"
        SinkDeletes.write(fs, path, name, deletes)
        Some((name, deletes.map(_._1).distinct))
      }
    // conflict guard: an UPDATE/MERGE (carries inserts) derived its
    // post-image rows from reading the deleted positions' files — a
    // delete manifest that landed since the scan and touches them
    // means a concurrent update of the same rows (duplicate
    // post-image hazard). A pure DELETE commits without the guard:
    // concurrent position deletes are idempotent by construction.
    val readSnapshot =
      if (files.isEmpty) None
      else op.scanDeleteManifests.map(seen =>
        SinkReadSnapshot(seen, deletes.map(_._1).toSet))
    SinkCommit.replacePublish(fs, path, partCols, files,
      replaced = Seq.empty,
      f => s"part-$qTok-" +
        new Path(f.stagedPath).getName.stripPrefix("part-"),
      statsToken = queryId, versioned = versioned,
      newDeleteManifest = manifest,
      changesDir = None,
      readSnapshot = readSnapshot)
    sweepStaging(fs)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    sweepStaging(SinkCommit.fsFor(path))

  private def sweepStaging(fs: FileSystem): Unit = {
    fs.delete(stagingDir, true)
    val parent = stagingDir.getParent
    if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
      fs.delete(parent, true)
  }
}

/** Commit half of the rewrite: publish the fresh files through the
  * sink's normal rename protocol, then retire exactly the scanned
  * groups atomically via the manifest CAS (auto-upgrading a
  * not-yet-versioned table — see [[SinkCommit.replacePublish]]).
  */
private class SinkReplaceBatchWrite(
    path: String, partCols: Seq[String], schema: StructType,
    queryId: String, versioned: Boolean, op: SinkRowLevelOperation,
    props: Map[String, String] = Map.empty)
    extends BatchWrite {

  private def stagingDir = new Path(path, s"_staging/$queryId")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new PartitionedSinkWriterFactory(path, partCols, schema, queryId,
      PartitionedSinkWriterFactory.sessionConf(),
      SinkBloomConf.fromSession(props))

  override def useCommitCoordinator(): Boolean = true

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = SinkCommit.fsFor(path)
    val files = messages.collect { case m: SinkCommitMessage => m.files }
      .flatten.toSeq
    val qTok = queryId.replaceAll("[^0-9a-zA-Z]", "").take(8)
    val destName = (f: StagedFile) => s"part-$qTok-" +
      new Path(f.stagedPath).getName.stripPrefix("part-")
    if (files.isEmpty && op.plannedGroups.isEmpty) { sweepStaging(fs); return }
    val fresh = SinkCommit.replaceStage(fs, path, partCols, files,
      destName, statsToken = queryId)
    // ROW-GRAIN CHANGE FILES (`graft.rowChanges`): the one-job net
    // diff between the replaced groups' rows and the fresh ones is
    // exactly what the rewrite changed — carried-forward rows cancel.
    // Written BEFORE the CAS under a uuid dir and linked by the
    // manifest's `#\tchanges` header, so a feed either sees the
    // commit with its change rows or not at all (a crash in between
    // leaves an unreferenced dir for vacuum). Labels come from the
    // command — see [[SinkCowChanges]] for the MERGE caveat.
    val changesDir =
      if (!SinkFormat.rowChanges(props)) None
      else SinkCowChanges.write(path, partCols, schema,
        op.plannedGroups, fresh, op.command(), qTok,
        SinkFormat.fieldIds(props),
        op.scanDeleteManifests.getOrElse(Set.empty).toSeq.sorted
          .map(n => new Path(path, s"_deletes/$n").toString))
    SinkCommit.replaceCommit(fs, path, partCols, fresh,
      op.plannedGroups.map(_._1), changesDir = changesDir,
      readSnapshot = op.scanDeleteManifests.map(seen =>
        SinkReadSnapshot(seen, op.plannedGroups.map(_._1).toSet)))
    sweepStaging(fs)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    sweepStaging(SinkCommit.fsFor(path))

  private def sweepStaging(fs: FileSystem): Unit = {
    fs.delete(stagingDir, true)
    val parent = stagingDir.getParent
    if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
      fs.delete(parent, true)
  }
}
