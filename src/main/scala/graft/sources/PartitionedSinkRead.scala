package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
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
  *   - PARTITION PRUNING ([[SupportsPushDownFilters]]): `pCol = v`,
  *     `pCol IN (...)` and `IsNotNull(pCol)` on ANY of the partition
  *     columns are consumed at planning time — pruned subtrees
  *     contribute ZERO input splits, and a predicate on any SUBSET of
  *     a multi-level layout's columns prunes at its own level (a
  *     `month = 3` filter on a year/month/day table skips eleven
  *     twelfths of every year without touching the day listings).
  *     Data-column predicates are declined (returned as post-scan
  *     filters) — a text layout has no row-group statistics to prune
  *     with.
  *   - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the
  *     reader still splits every line (a TSV row must be walked to be
  *     skipped) but only DECODES and materializes requested fields;
  *     partition columns cost nothing (they come from the dir names,
  *     one constant tuple per split).
  *
  * One [[InputPartition]] per data FILE — the natural split grain of
  * the layout (files are per-(task, partition-tuple) from the write
  * side, so sizes track write parallelism). Executors get the session
  * Hadoop conf the same way the writer does.
  */
private[sources] class PartitionedSinkScanBuilder(
    path: String, partCols: Seq[String], fullSchema: StructType,
    asOfVersion: Option[Long] = None,
    fieldIds: Map[String, Int] = Map.empty)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  private var partitionFilters: Array[Filter] = Array.empty
  private var skipFilters: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var pushedAgg: Option[(StructType, Array[InternalRow], String)] = None
  private var limitHint: Option[Int] = None

  /** LIMIT pushdown, PARTIAL by contract (Spark keeps its own limit on
    * top, so serving extra rows is fine; serving fewer than
    * min(limit, total) would not be): Spark only plans this pushdown
    * when the limit sits DIRECTLY on the scan — every filter of this
    * sink stays residual as a Filter node, so a filtered query never
    * reaches here — and the scan uses the hint to plan a file PREFIX
    * whose manifest-recorded row counts already cover the limit: a
    * `LIMIT 10` over a million-file table plans one split. The hint is
    * ignored (all files planned) whenever exactness of the trim cannot
    * be proven: a file without a recorded count, or active
    * merge-on-read deletes (recorded counts overstate live rows —
    * trimming could undershoot).
    */
  override def pushLimit(limit: Int): Boolean = {
    limitHint = Some(limit)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** METADATA-ONLY aggregates: a filterless `COUNT(*)` / `MIN(col)` /
    * `MAX(col)` answers from the publish manifests (exact per-file row
    * counts; exact numeric bounds) without planning a single data
    * split — at warehouse scale the difference between a driver-side
    * manifest read and a full-table scan. COMPLETE pushdown only (the
    * answer is final), and only when it is provably exact: no residual
    * filters (this sink keeps every filter residual, so Spark only
    * attempts the pushdown on filterless plans; double-checked here),
    * no active merge-on-read deletes (a deleted row may be the min, and
    * counts would overstate), every live file carrying the needed
    * stats, numeric columns only (string bounds are TRUNCATED by
    * design — a prefix is not the true min). Anything else declines
    * and the normal scan runs.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    if (pushedAgg.isEmpty)
      pushedAgg = SinkAggPushdown.compute(path, partCols, fullSchema,
        asOfVersion, agg,
        noFilters = partitionFilters.isEmpty && skipFilters.isEmpty)
    pushedAgg.isDefined
  }

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = supportCompletePushDown(agg)

  // subclass hooks (the COW row-level scan builder reuses this
  // builder's pushdown verbatim and only swaps the built Scan)
  protected def requiredSchema: StructType = required
  protected def pushedPartitionFilters: Array[Filter] = partitionFilters
  protected def pushedSkipFilters: Array[Filter] = skipFilters

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // a NULL inside the comparison (isin(lit(null), ...) / === null)
    // never matches a partition dir and its rendering is undefined —
    // decline pushdown and leave such filters entirely to Spark
    val pushable = filters.filter {
      case EqualTo(c, v) => partCols.contains(c) && v != null
      case In(c, vs) =>
        partCols.contains(c) && vs != null && !vs.contains(null)
      case IsNotNull(c) => partCols.contains(c) // never null by contract
      case _ => false
    }
    partitionFilters = pushable
    // DATA-column comparisons become FILE-SKIP candidates against the
    // per-file min/max manifests the write side publishes (SinkStats):
    // a file whose recorded range provably excludes the predicate
    // contributes zero splits — the row-group pruning a Parquet lake
    // gets from footers, recovered for the text layout
    skipFilters = filters.filter {
      case GreaterThan(c, _) => !partCols.contains(c)
      case GreaterThanOrEqual(c, _) => !partCols.contains(c)
      case LessThan(c, _) => !partCols.contains(c)
      case LessThanOrEqual(c, _) => !partCols.contains(c)
      case EqualTo(c, v) => !partCols.contains(c) && v != null
      case In(c, vs) =>
        !partCols.contains(c) && vs != null && !vs.contains(null)
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
    // keep the table's field order (the line decoder walks by ordinal);
    // METADATA columns (`_file` — not in the table schema) append at
    // the end in requested order
    required = StructType(
      fullSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name))
        ++ requiredSchema.fields.filterNot(f =>
          fullSchema.fieldNames.contains(f.name)))

  override def build(): Scan = pushedAgg match {
    case Some((schema, rows, desc)) => new SinkLocalAggScan(schema, rows, desc)
    case None =>
      new PartitionedSinkScan(path, partCols, fullSchema, required,
        partitionFilters, skipFilters, asOfVersion, fieldIds, limitHint)
  }
}

/** The one-row driver-side scan a complete aggregate pushdown plans —
  * no input partitions, no executors, no data files.
  */
private[sources] class SinkLocalAggScan(schema: StructType,
                                        aggRows: Array[InternalRow],
                                        desc: String)
    extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = aggRows
  override def description(): String = desc
}

/** Driver-side evaluation of a pushed aggregation against the sink's
  * manifests. Returns None whenever exactness cannot be PROVEN —
  * the caller then falls back to the ordinary scan.
  */
private[sources] object SinkAggPushdown {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private def colOf(
      e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      Some(r.fieldNames()(0))
    case _ => None
  }

  private def numeric(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType => true
    case _ => false
  }

  def compute(path: String, partCols: Seq[String], fullSchema: StructType,
              asOfVersion: Option[Long], agg: Aggregation,
              noFilters: Boolean)
      : Option[(StructType, Array[InternalRow], String)] = {
    if (!noFilters || agg.aggregateExpressions.isEmpty) return None
    // GROUP BY is answerable when every group key is a PARTITION
    // column (any subset, any order): the manifests carry the full
    // tuple per file, so groups aggregate per key driver-side —
    // `count(*) GROUP BY p` over a petabyte as a metadata read
    val groupCols: Seq[String] = agg.groupByExpressions.toSeq.map { e =>
      colOf(e) match {
        case Some(c) if partCols.contains(c) => c
        case _ => return None
      }
    }
    // every requested function must be answerable before any IO beyond
    // the (small, driver-side) manifest reads below
    val wanted: Seq[Either[Unit, (String, Boolean)]] =
      agg.aggregateExpressions.toSeq.map {
        case _: CountStar => Left(())
        case m: Min => colOf(m.column) match {
          case Some(c) if fullSchema.fieldNames.contains(c) &&
            !partCols.contains(c) &&
            numeric(fullSchema(c).dataType) => Right((c, false))
          case _ => return None
        }
        case m: Max => colOf(m.column) match {
          case Some(c) if fullSchema.fieldNames.contains(c) &&
            !partCols.contains(c) &&
            numeric(fullSchema(c).dataType) => Right((c, true))
          case _ => return None
        }
        case _ => return None
      }
    val fs = FileSystem.get(new java.net.URI(path),
      SparkSession.active.sessionState.newHadoopConf())
    val root = new Path(path)
    // live membership: pinned/latest snapshot on a versioned table,
    // the listing otherwise; ACTIVE POSITION DELETES disqualify (a
    // deleted row may hold the min; counts would overstate)
    val entries: Seq[(String, Seq[String])] =
      if (!fs.exists(root)) Seq.empty
      else asOfVersion match {
        case Some(v) =>
          if (SinkVersions.readDeletes(fs, path, v).nonEmpty) return None
          SinkVersions.read(fs, path, v)
        case None if SinkVersions.isVersioned(fs, path) =>
          SinkVersions.latest(fs, path) match {
            case None => Seq.empty
            case Some(v) =>
              if (SinkVersions.readDeletes(fs, path, v).nonEmpty) return None
              SinkVersions.read(fs, path, v)
          }
        case None =>
          SinkLayout.listLeaves(fs, root, partCols).flatMap {
            case (values, leaf) =>
              val rel = SinkLayout.leafRel(partCols, values)
              SinkLayout.dataFiles(fs, leaf).map(f =>
                (s"$rel/${f.getPath.getName}", values))
          }
      }
    // per-dir stats manifests, loaded once per dir
    val statsByDir = scala.collection.mutable.Map[
      String, Map[String, SinkFileStats]]()
    val perFile: Seq[(Seq[String], SinkFileStats)] = entries.map {
      case (rel, values) =>
        val slash = rel.lastIndexOf('/')
        val name = rel.drop(slash + 1)
        val dir = rel.take(math.max(slash, 0))
        statsByDir.getOrElseUpdate(dir,
          SinkStats.readDir(fs, new Path(path, rel).getParent))
          .get(name) match {
          case Some(st) => (values, st)
          case None => return None // a file without stats: cannot prove
        }
    }
    val groupIdx = groupCols.map(partCols.indexOf)

    def aggValues(files: Seq[SinkFileStats]): Option[Seq[Any]] = Some(wanted.map {
      case Left(()) =>
        val counts = files.map(_.rows)
        if (!counts.forall(_.isDefined)) return None
        counts.flatten.sum
      case Right((c, wantMax)) =>
        val dt = fullSchema(c).dataType
        // every file must CARRY an entry for the column (Some(None) =
        // provably all-NULL contributes nothing; a MISSING entry —
        // poisoned NaN/Inf stats or a pre-stats file — is unprovable)
        val bounds = files.map { st =>
          st.cols.get(c) match {
            case Some(b) => b
            case None => return None
          }
        }
        val picked = bounds.flatten.map { case (mn, mx) =>
          PartitionedSinkReader.castValue(if (wantMax) mx else mn, dt)
        }
        if (picked.isEmpty) null // zero rows / all NULL: SQL min = NULL
        else dt match {
          // exact for the sink's numeric renderings: integrals fit a
          // double only to 2^53 — compare longs as longs instead
          case LongType | IntegerType | ShortType | ByteType =>
            val ls = picked.map(_.asInstanceOf[java.lang.Number].longValue)
            val win = if (wantMax) ls.max else ls.min
            PartitionedSinkReader.castValue(win.toString, dt)
          case _ => // Double/Float only (the numeric() gate above)
            val sel = picked.map(v =>
              (v, v.asInstanceOf[java.lang.Number].doubleValue))
              .sortBy(_._2)
            if (wantMax) sel.last._1 else sel.head._1
        }
    })

    val rows: Array[InternalRow] =
      if (groupCols.isEmpty)
        Array(org.apache.spark.sql.catalyst.InternalRow.fromSeq(
          aggValues(perFile.map(_._2)).getOrElse(return None).toIndexedSeq))
      else perFile.groupBy { case (values, _) => groupIdx.map(values) }
        .toSeq.sortBy(_._1.mkString(" "))
        .map { case (key, files) =>
          val keyVals = groupCols.zip(key).map { case (c, raw) =>
            PartitionedSinkReader.castValue(raw, fullSchema(c).dataType)
          }
          org.apache.spark.sql.catalyst.InternalRow.fromSeq(
            (keyVals ++ aggValues(files.map(_._2)).getOrElse(return None))
              .toIndexedSeq)
        }.toArray
    val schema = StructType(
      groupCols.map(c => StructField(c, fullSchema(c).dataType,
        nullable = false)) ++
      wanted.zipWithIndex.map {
        case (Left(()), i) => StructField(s"count_star_$i", LongType,
          nullable = false)
        case (Right((c, wantMax)), i) =>
          StructField(s"${if (wantMax) "max" else "min"}_${c}_$i",
            fullSchema(c).dataType, nullable = true)
      })
    Some((schema, rows,
      s"SinkLocalAggScan($path, ${agg.aggregateExpressions.toSeq
        .mkString(", ")}${if (groupCols.isEmpty) ""
        else groupCols.mkString(" GROUP BY ", ", ", "")})"))
  }
}

private[sources] class PartitionedSinkScan(
    path: String, partCols: Seq[String], fullSchema: StructType,
    required: StructType, partitionFilters: Array[Filter],
    skipFilters: Array[Filter] = Array.empty,
    asOfVersion: Option[Long] = None,
    fieldIds: Map[String, Int] = Map.empty,
    limitHint: Option[Int] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PartitionedSinkScan($path)" +
      asOfVersion.map(v => s" VERSION AS OF $v").getOrElse("") +
      " PushedPartitionFilters: " +
      partitionFilters.mkString("[", ", ", "]") +
      " FileSkipFilters: " + skipFilters.mkString("[", ", ", "]")

  /** Do the pushed filters accept value `v` for partition column
    * `colName`? Filters on OTHER partition columns don't constrain it.
    */
  private def keepAt(colName: String, v: String): Boolean =
    partitionFilters.forall {
      case EqualTo(c, want) => c != colName || v == want.toString
      case In(c, vs) => c != colName || vs.exists(w => v == w.toString)
      case _ => true
    }

  private def keepTuple(values: Seq[String]): Boolean =
    partCols.zip(values).forall { case (c, v) => keepAt(c, v) }

  // driver-side skip accounting, surfaced as CUSTOM METRICS in the SQL
  // UI node ("why didn't this skip?" without a debugger): filled when
  // the lazy pruning below runs, reported by reportDriverMetrics
  @volatile private var skippedByStats = 0L
  @volatile private var skippedByBloom = 0L
  @volatile private var filesScanned = 0L
  @volatile private var skippedByRuntime = 0L

  /** RUNTIME partition pruning (DPP through
    * [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]):
    * when a join's key is one of this scan's PARTITION columns,
    * Catalyst plans a DynamicPruning subquery on the other side (the
    * classic star shape — a filtered dim, usually an already-built
    * broadcast, decides which fact partitions matter at all) and
    * delivers the surviving keys here as an `IN` predicate between
    * physical planning and execution. At warehouse scale this is the
    * difference between scanning a 100 TB fact table's every
    * partition and scanning the three the dim filter actually joins.
    *
    * The keys land as a per-column allow-set of RENDERED partition
    * values (the writer's own string rendering, so comparison is
    * exact), applied in [[planInputPartitions]] ON TOP of the cached
    * static plan — planning may have forced the lazy pruning walk
    * long before the runtime filter arrives, and re-walking would
    * race the snapshot. Runtime pruning only ever DROPS splits, so
    * every static guarantee (manifest snapshot, delete manifests,
    * key-grouped output — Spark backfills empty groups for dropped
    * keys) still holds. Unknown predicate shapes are IGNORED: scan
    * more than strictly needed, never less.
    */
  @volatile private var runtimeTupleKeep
      : Option[Map[String, Set[String]]] = None

  /** Runtime DATA-column predicates, kept as v1 `In` filters for
    * [[SinkFileSkip.mayMatch]] against the per-file min/max retained
    * from the pruning walk — a join keyed on a CLUSTERED (or
    * naturally ordered) column then skips whole files at runtime,
    * the same way DPP skips whole partitions. Bounded: an IN-set
    * beyond [[SinkRuntimePrune.MaxSkipValues]] is ignored (the
    * per-file probe is values × files driver work, and a join wide
    * enough to carry 10k+ distinct keys rarely skips anything).
    */
  @volatile private var runtimeSkipFilters: Seq[Filter] = Seq.empty

  /** A LIMIT-trimmed scan must not runtime-filter: the trimmed file
    * prefix covers the limit by ROW COUNT, and dropping any of its
    * files afterwards could undershoot the limit. Declaring no filter
    * attributes keeps Catalyst from planning the subquery at all.
    *
    * Only columns SURVIVING column pruning are declared: Spark's
    * PartitionPruning rule resolves the declared attributes against
    * the scan relation's (pruned) output and THROWS on a miss — e.g.
    * the matching-files subquery a MERGE plans projects just
    * (join key, `_file`), and declaring a projected-away partition
    * column there kills the whole statement at analysis. Declared:
    * the partition columns (whole-partition pruning) plus every
    * atomic non-binary data column (file-grain min/max pruning;
    * binary columns carry no stats by design, and the metadata
    * `_file`/`_pos` never describe row content).
    */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (limitHint.isDefined) Array.empty
    else required.fields
      .filter(f => partCols.contains(f.name) ||
        (SinkRuntimePrune.statsEligible(f.dataType) &&
          f.name != SinkMeta.FileCol && f.name != SinkMeta.PosCol))
      .map(f => org.apache.spark.sql.connector.expressions
        .Expressions.column(f.name)).toArray

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions
        .filter.Predicate]): Unit = {
    val declared = filterAttributes().map(_.fieldNames()(0)).toSet
    val parsed = predicates.toSeq
      .flatMap(SinkRuntimePrune.parse(declared, _))
    val (onPart, onData) = parsed.partition(p => partCols.contains(p._1))
    if (onPart.nonEmpty)
      runtimeTupleKeep = Some(onPart.groupBy(_._1)
        .map { case (c, vs) =>
          c -> vs.map(_._2.map(_.toString).toSet).reduce(_ intersect _) })
    runtimeSkipFilters = onData.collect {
      case (c, vs) if vs.nonEmpty &&
        vs.length <= SinkRuntimePrune.MaxSkipValues =>
        In(c, vs.toArray): Filter
    }
  }
  /** Active position-delete manifests (absolute paths) of the snapshot
    * being read — every split anti-filters its rows through them.
    * Filled by the pruning walk (versioned tables only).
    */
  @volatile protected var activeDeleteManifests: Seq[String] = Seq.empty

  /** Surviving files' recorded column bounds (abs path → col →
    * min/max), retained from the pruning walk for runtime file
    * skipping. Files without a stats entry are absent — and always
    * kept.
    */
  @volatile private var fileStatsForRuntime
      : Map[String, Map[String, Option[(String, String)]]] = Map.empty

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    SinkScanMetrics.all

  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    prunedFilesWithStats // force the pruning if nothing else has
    SinkScanMetrics.report(
      // post-runtime-filter view: what actually scanned
      "filesScanned" -> (filesScanned - skippedByRuntime),
      "filesSkippedStats" -> skippedByStats,
      "filesSkippedBloom" -> skippedByBloom,
      "filesSkippedRuntime" -> skippedByRuntime)
  }

  /** (tuple, file, recorded rows) for every partition SURVIVING the
    * pushed filters — shared by split planning and statistics, so both
    * see the same pruned view. Membership comes from the pruned
    * recursive directory walk, or — on a VERSIONED table — from the
    * snapshot manifest (the requested `VERSION AS OF`, else the
    * latest), which is what makes logically retired files invisible
    * without physical deletes.
    */
  private lazy val prunedFilesWithStats
      : Seq[(Seq[String], FileStatus, Option[Long])] = {
    val fs = FileSystem.get(new java.net.URI(path),
      SparkSession.active.sessionState.newHadoopConf())
    val root = new Path(path)
    if (!fs.exists(root)) Seq.empty
    else {
      // resolve one manifest's entries to FileStatuses. For an EXPLICIT
      // `VERSION AS OF` a missing file is a hard error (the user asked
      // for a specific snapshot; serving part of it would be a silent
      // wrong answer). For a LATEST read, a missing file means a
      // vacuum/publish raced this scan's planning — None signals the
      // caller to re-resolve the newest manifest and retry, rather
      // than turning a benign race into a query failure.
      def resolve(v: Long, strict: Boolean)
          : Option[Seq[(Seq[String], FileStatus)]] = {
        activeDeleteManifests = SinkVersions.readDeletes(fs, path, v)
          .map(n => new Path(root, s"_deletes/$n").toString)
        val entries = SinkVersions.read(fs, path, v)
          .filter { case (_, values) => keepTuple(values) }
        val resolved = entries.map { case (rel, values) =>
          val p = new Path(path, rel)
          if (fs.exists(p)) Some(values -> fs.getFileStatus(p))
          else if (strict) throw new IllegalStateException(
            s"version $v of $path references $rel, which no longer " +
              "exists — vacuumed beyond retention?")
          else None
        }
        if (resolved.forall(_.isDefined)) Some(resolved.flatten)
        else None
      }
      // (tuple, data file) after partition pruning, before file skipping
      val candidates: Seq[(Seq[String], FileStatus)] =
        asOfVersion match {
          case Some(v) => resolve(v, strict = true).get
          case None if SinkVersions.isVersioned(fs, path) =>
            SinkVersions.latest(fs, path) match {
              case None => Seq.empty
              case Some(v1) => resolve(v1, strict = false).getOrElse {
                // raced a vacuum/publish: one retry against whatever is
                // newest NOW; files still missing then are tolerated
                // (replaced since) — a latest read serves latest state
                SinkVersions.latest(fs, path).toSeq.flatMap { v2 =>
                  activeDeleteManifests = SinkVersions
                    .readDeletes(fs, path, v2)
                    .map(n => new Path(root, s"_deletes/$n").toString)
                  SinkVersions.read(fs, path, v2)
                    .filter { case (_, values) => keepTuple(values) }
                    .flatMap { case (rel, values) =>
                      val p = new Path(path, rel)
                      if (fs.exists(p)) Some(values -> fs.getFileStatus(p))
                      else None
                    }
                }
              }
            }
          case None =>
            SinkLayout.listLeaves(fs, root, partCols,
              (level, v) => keepAt(partCols(level), v)) // partition pruning
              .flatMap { case (values, leaf) =>
                SinkLayout.dataFiles(fs, leaf).map(values -> _)
              }
        }
      // per-dir stats manifests (driver-side, small — one per publish
      // per dir): used for FILE SKIPPING (drop every file whose
      // recorded min/max provably excludes a skip filter; files
      // without stats are always kept) and for the exact ROW COUNTS
      // estimateStatistics reports. Loaded once per dir per scan.
      val wantBloom = SinkFileSkip.wantsBloom(skipFilters)
      val statsAcc = Map.newBuilder[String,
        Map[String, Option[(String, String)]]]
      val out = candidates.groupBy(_._2.getPath.getParent).toSeq
        .flatMap { case (dir, inDir) =>
          val stats = SinkStats.readDir(fs, dir)
          // bloom manifests load only for scans with point predicates
          val blooms =
            if (wantBloom) SinkBlooms.readDir(fs, dir)
            else Map.empty[String,
              Map[String, org.apache.spark.util.sketch.BloomFilter]]
          inDir.flatMap { case (values, f) =>
            val st = stats.get(f.getPath.getName)
            val keepStats = st.forall(s =>
              skipFilters.forall(SinkFileSkip.mayMatch(_, s.cols)))
            val keepBloom = keepStats &&
              blooms.get(f.getPath.getName).forall(bm =>
                skipFilters.forall(SinkFileSkip.mayMatchBloom(_, bm)))
            if (!keepStats) skippedByStats += 1
            else if (!keepBloom) skippedByBloom += 1
            if (keepStats && keepBloom) {
              // retain surviving files' column bounds for RUNTIME
              // file skipping (join-key IN-sets arriving after static
              // planning probe these without re-reading a manifest)
              st.foreach(s => statsAcc += f.getPath.toString -> s.cols)
              Some((values, f, st.flatMap(_.rows)))
            } else None
          }
        }
      fileStatsForRuntime = statsAcc.result()
      filesScanned = out.size
      out
    }
  }

  /** Statically pruned (partition pruning + file skipping) file
    * groups — the subclassable seam the COW row-level scan filters
    * further at runtime.
    */
  protected lazy val staticPrunedFiles: Seq[(Seq[String], FileStatus)] =
    prunedFilesWithStats.map(t => (t._1, t._2))
  private def prunedFiles: Seq[(Seq[String], FileStatus)] = staticPrunedFiles

  private lazy val keyTypes: Seq[DataType] =
    partCols.map(c => fullSchema(c).dataType)

  /** Byte-range split carving: a scan that cannot split a 10 GB file
    * is one task at 100 TB. The TSV codec escapes \n and \r inside
    * values, so every ROW is one physical LINE and the classic
    * LineRecordReader contract applies — split i reads the lines whose
    * first byte lies in (start_i, end_i] (the first split from 0), a
    * line crossing the boundary is finished by the split that started
    * it, and every split with start > 0 discards its first (possibly
    * partial) line. Files at or under the threshold stay whole.
    */
  /** LIMIT-driven file trimming: the shortest deterministic PREFIX of
    * files whose recorded rows cover the pushed limit. Only when
    * provable: every surviving file carries a count and no position
    * deletes are active (they make counts overstate live rows).
    */
  private lazy val limitedFiles: Seq[(Seq[String], FileStatus)] =
    limitHint match {
      case Some(n) if activeDeleteManifests.isEmpty &&
        prunedFilesWithStats.nonEmpty &&
        prunedFilesWithStats.forall(_._3.isDefined) =>
        val sorted = prunedFilesWithStats.sortBy(_._2.getPath.toString)
        var acc = 0L
        val taken = sorted.takeWhile { t =>
          val need = acc < n
          acc += t._3.get
          need
        }
        taken.map(t => (t._1, t._2))
      case _ => prunedFiles
    }

  private lazy val inputSplits: Array[InputPartition] = {
    val maxSplit = SinkSplitConf.maxSplitBytes(SparkSession.active)
    limitedFiles.flatMap { case (values, f) =>
      val len = f.getLen
      val rel = s"${SinkLayout.leafRel(partCols, values)}/${f.getPath.getName}"
      if (len <= maxSplit)
        Seq(SinkFileSplit(f.getPath.toString, values, keyTypes,
          relPath = rel, delManifests = activeDeleteManifests)
          : InputPartition)
      else (0L until len by maxSplit).map(s =>
        SinkFileSplit(f.getPath.toString, values, keyTypes,
          s, math.min(maxSplit, len - s),
          relPath = rel, delManifests = activeDeleteManifests)
          : InputPartition)
    }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] =
    if (runtimeTupleKeep.isEmpty && runtimeSkipFilters.isEmpty) inputSplits
    else {
      val kept = inputSplits.filter { p =>
        val s = p.asInstanceOf[SinkFileSplit]
        val tupleOk = runtimeTupleKeep.forall(keep =>
          partCols.zip(s.partValues).forall { case (c, v) =>
            keep.get(c).forall(_.contains(v)) })
        // stats-less files always pass (mayMatch's own contract)
        tupleOk && fileStatsForRuntime.get(s.file).forall(st =>
          runtimeSkipFilters.forall(SinkFileSkip.mayMatch(_, st)))
      }
      // count FILES, not splits (giant files may be byte-carved)
      def files(a: Array[InputPartition]) =
        a.map(_.asInstanceOf[SinkFileSplit].file).distinct.length
      skippedByRuntime = (files(inputSplits) - files(kept)).toLong
      kept
    }

  private lazy val carved: Boolean = inputSplits.length > limitedFiles.size

  /** POST-PRUNING statistics: `pCol = v` reports only v's bytes,
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
        // exact only while no position deletes are active (recorded
        // per-file counts would overestimate — worse for the CBO than
        // no estimate)
        if (prunedFilesWithStats.nonEmpty &&
            prunedFilesWithStats.forall(_._3.isDefined) &&
            activeDeleteManifests.isEmpty)
          java.util.OptionalLong.of(prunedFilesWithStats.flatMap(_._3).sum)
        else if (prunedFilesWithStats.isEmpty)
          java.util.OptionalLong.of(0L)
        else java.util.OptionalLong.empty()
    }

  /** STORAGE-PARTITIONED execution: the layout IS hash-free clustered
    * on the partition tuple, and saying so (KeyGroupedPartitioning +
    * per-split [[SinkFileSplit.partitionKey]]) lets Catalyst satisfy a
    * ClusteredDistribution over the partition columns straight from
    * the files — a `GROUP BY p1, p2` or a storage-partitioned join on
    * the tuple plans ZERO exchanges (requires
    * `spark.sql.sources.v2.bucketing.enabled`, on in GraftSession). At
    * warehouse scale that removes the shuffle from exactly the queries
    * a partitioned table exists to serve.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    // key-grouped execution collapses each TUPLE's splits into one
    // task — exactly right when a tuple is a handful of files (zero-
    // exchange GROUP BY / joins), exactly wrong once a file was carved
    // into byte ranges for parallelism: grouping would re-serialize
    // the ranges. Report the clustering only when nothing was carved.
    if (carved)
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
        inputSplits.length)
    else
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        partCols.map(c => org.apache.spark.sql.connector.expressions
          .Expressions.identity(c)
          : org.apache.spark.sql.connector.expressions.Expression).toArray,
        limitedFiles.map(_._1).distinct.size)

  override def createReaderFactory(): PartitionReaderFactory =
    // the pushed data-column comparisons ride to the parquet readers
    // for ROW-GROUP footer-stats skipping (the grain below the
    // manifest-level file skip); sound because every filter stays
    // residual. The COW row-level scan overrides this with NO skip
    // filters — group rewrites read their files whole. COLUMNAR when
    // every split qualifies (all-parquet, no MOR deletes): batches +
    // ColumnarToRow beat row materialization by the per-value decode
    // cost — see SinkParquetColumnarReader.
    new PartitionedSinkReaderFactory(fullSchema, required, partCols,
      PartitionedSinkWriterFactory.sessionConf(), fieldIds,
      skipFilters.toSeq,
      columnar = SinkParquetColumnar.enabledInSession() &&
        SinkParquetColumnar.schemaEligible(required) &&
        inputSplits.nonEmpty && SinkParquetColumnar.splitsEligible(
          inputSplits.toSeq.map(_.asInstanceOf[SinkFileSplit])))

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // mirror the write-side guard in PartitionedSinkTable: a streaming
    // read of a pinned snapshot would otherwise silently tail LATEST
    require(asOfVersion.isEmpty,
      "cannot stream-read a time-travel (VERSION AS OF) table reference")
    new PartitionedSinkMicroBatchStream(path, partCols, fullSchema, required,
      partitionFilters, keepTuple, checkpointLocation, skipFilters, fieldIds)
  }
}

/** Custom scan metrics: per-mechanism file-skip counts, shown on the
  * BatchScan node in the SQL UI (and readable from the executed plan's
  * metrics in tests). Driver metrics — the pruning is driver-side.
  */
private[sources] object SinkScanMetrics {
  val all: Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new FilesScannedMetric, new FilesSkippedStatsMetric,
      new FilesSkippedBloomMetric, new FilesSkippedRuntimeMetric)

  def report(values: (String, Long)*)
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    values.map { case (n, v) =>
      new org.apache.spark.sql.connector.metric.CustomTaskMetric {
        override def name(): String = n
        override def value(): Long = v
      }
    }.toArray
}

/** Top-level, zero-arg-constructible metric classes: Spark's SQL
  * status listener re-instantiates CustomMetric classes reflectively
  * when aggregating, and rejects nested/parameterized constructors.
  */
private[sources] sealed abstract class SinkSumMetric(
    metricName: String, desc: String)
    extends org.apache.spark.sql.connector.metric.CustomMetric {
  override def name(): String = metricName
  override def description(): String = desc
  override def aggregateTaskMetrics(values: Array[Long]): String =
    values.sum.toString
}
private[sources] final class FilesScannedMetric
    extends SinkSumMetric("filesScanned", "files surviving all pruning")
private[sources] final class FilesSkippedStatsMetric
    extends SinkSumMetric("filesSkippedStats", "files skipped by min/max stats")
private[sources] final class FilesSkippedBloomMetric
    extends SinkSumMetric("filesSkippedBloom", "files skipped by bloom filters")
private[sources] final class FilesSkippedRuntimeMetric
    extends SinkSumMetric("filesSkippedRuntime",
      "files skipped by runtime (dynamic) partition pruning")

/** Parses the runtime predicates Catalyst delivers through
  * SupportsRuntimeV2Filtering — `IN`/`=` over a declared column with
  * literal values — into (column, EXTERNAL values). External means
  * the v1-Filter value space (String not UTF8String, boxed numerics),
  * so the result feeds both consumers directly: partition-tuple
  * membership renders each value via `toString`, which mirrors the
  * writer's `rawStr` rendering exactly (strings raw, numerics and
  * booleans via toString — the strings the layout and manifests
  * store), and data-column file skipping wraps the values as a
  * v1 `In` for [[SinkFileSkip.mayMatch]]. NULL literals drop out of
  * the set (the writer rejects NULL partition values, and a stats
  * comparison with NULL never matches); any other unparseable shape
  * makes the whole predicate parse to None, which the caller treats
  * as "keep everything" — sound, never wrong.
  */
private[sources] object SinkRuntimePrune {
  import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Literal, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  /** IN-sets larger than this skip nothing (values × files of driver
    * probing for a join already too wide to prune much).
    */
  final val MaxSkipValues = 1000

  /** Types the stats manifests record bounds for — the data columns
    * worth declaring as runtime-filterable.
    */
  def statsEligible(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | DoubleType | FloatType |
         BooleanType | ShortType | ByteType => true
    case _ => false
  }

  private def external(v: Any): Option[Option[Any]] = v match {
    case null => Some(None)
    case u: UTF8String => Some(Some(u.toString))
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte | _: java.lang.Double | _: java.lang.Float |
         _: java.lang.Boolean => Some(Some(v))
    case _ => None
  }

  private def lit(e: V2Expr): Option[Option[Any]] = e match {
    case l: V2Literal[_] => external(l.value)
    case _ => None
  }

  private def ref(cols: Set[String], e: V2Expr): Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 &&
      cols.contains(r.fieldNames()(0)) => Some(r.fieldNames()(0))
    case _ => None
  }

  def parse(cols: Set[String], p: Predicate)
      : Option[(String, Seq[Any])] = p.name() match {
    case "IN" if p.children().nonEmpty =>
      ref(cols, p.children()(0)).flatMap { c =>
        val vals = p.children().drop(1).toSeq.map(lit)
        if (vals.forall(_.isDefined)) Some(c -> vals.flatten.flatten)
        else None
      }
    case "=" if p.children().length == 2 =>
      (ref(cols, p.children()(0)), ref(cols, p.children()(1))) match {
        case (Some(c), None) =>
          lit(p.children()(1)).map(v => c -> v.toSeq)
        case (None, Some(c)) =>
          lit(p.children()(0)).map(v => c -> v.toSeq)
        case _ => None
      }
    case _ => None
  }
}

/** Split-size knob shared by the batch scan and the streaming tail. */
private object SinkSplitConf {
  def maxSplitBytes(sess: SparkSession): Long = {
    val v = sess.conf.getOption("spark.graft.sink.maxSplitBytes")
      .map(_.toLong)
      .getOrElse(sess.sessionState.conf.filesMaxPartitionBytes)
    // reject instead of clamp: a non-positive threshold would carve one
    // InputPartition per byte — task-count and driver-memory blowup on
    // any real file; mirrors Spark's validation of filesMaxPartitionBytes
    require(v > 0,
      s"spark.graft.sink.maxSplitBytes must be positive, got $v")
    v
  }
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
  * The pre-r15 encoding carried the ENTIRE published-file list in
  * every offset — O(files) checkpoint growth per trigger; a LEGACY
  * (array-form) offset found in an old checkpoint is ABSORBED on first
  * deserialize: its unseen files are written as the next generation
  * (seeding the seen set), and the offset itself resolves to the raw
  * file set, so a mixed (legacy, generation) batch plans exactly the
  * delta — zero duplicated and zero lost files across the upgrade.
  * Append-only semantics — files removed by a dynamic overwrite after
  * being logged are skipped at planning (already-emitted rows are NOT
  * retracted; a reader of a table being rewritten wants a CDC log, not
  * a file tail — [[graft.ops.Compaction.tableChanges]] is that log).
  * Pushed partition filters drop pruned values' files
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
    path: String, partCols: Seq[String], fullSchema: StructType,
    required: StructType, partitionFilters: Array[Filter],
    keepTuple: Seq[String] => Boolean, checkpointLocation: String,
    skipFilters: Array[Filter] = Array.empty,
    fieldIds: Map[String, Int] = Map.empty)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class GenOffset(gen: Long) extends Offset {
    override def json(): String = s"""{"gen":$gen}"""
  }

  /** A pre-r15 (file-list) offset recovered from an old checkpoint.
    * Carries the raw file set for exact delta planning; re-serializes
    * verbatim (it only ever flows back into logs that already hold it).
    */
  private case class LegacyFilesOffset(files: Seq[String], raw: String)
      extends Offset {
    override def json(): String = raw
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

  private def readLog(f: FileSystem, p: Path): Seq[(String, Seq[String])] = {
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
      val fields = line.split("\t", -1)
      if (fields.length < 2) None
      else Some((
        TsvCodec.unescape(UTF8String.fromString(fields.head)).toString,
        fields.tail.toSeq.map(s =>
          TsvCodec.unescape(UTF8String.fromString(s)).toString)))
    }
  }

  private def writeLog(f: FileSystem, gen: Long,
                       files: Seq[(String, Seq[String])]): Unit = {
    f.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-$gen-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(files.map { case (file, values) =>
      (TsvCodec.escape(file) +: values.map(TsvCodec.escape)).mkString("\t")
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new Path(logDir, gen.toString)))
      throw new java.io.IOException(s"file-log commit failed for gen $gen")
  }

  private def listFiles(): Seq[(String, Seq[String])] = {
    val f = fs
    val root = new Path(path)
    if (!f.exists(root)) Seq.empty
    // VERSIONED table: live membership is the latest snapshot manifest
    // (logically retired files must not re-enter the tail)
    else if (SinkVersions.isVersioned(f, path))
      SinkVersions.latest(f, path).toSeq
        .flatMap(SinkVersions.read(f, path, _))
        .filter { case (_, values) => keepTuple(values) }
        .map { case (rel, values) => new Path(path, rel).toString -> values }
        .sortBy(_._1)
    else SinkLayout.listLeaves(f, root, partCols)
      .filter { case (values, _) => keepTuple(values) }
      .flatMap { case (values, leaf) =>
        SinkLayout.dataFiles(f, leaf).map(_.getPath.toString -> values)
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

  /** Recover the partition tuple of a legacy-offset file from its
    * path: the last `partCols.length` directory names are the
    * hive-escaped `col=value` segments.
    */
  private def valuesFromPath(file: String): Seq[String] = {
    var p = new Path(file).getParent
    var segs = List.empty[String]
    var k = partCols.length
    while (k > 0 && p != null) {
      segs = p.getName :: segs
      p = p.getParent
      k -= 1
    }
    partCols.zip(segs).map { case (c, seg) =>
      TsvCodec.unescapeDir(seg.stripPrefix(c + "="))
    }
  }

  /** One-time migration of a pre-r15 checkpoint: the first time a
    * legacy array offset is seen, its not-yet-logged files are written
    * as the next generation, so the seen set covers everything the old
    * checkpoint had emitted and `latestOffset` never re-emits it. A
    * second legacy offset (the replay START of an uncommitted batch —
    * a subset of the first) finds nothing fresh and writes nothing.
    */
  private def absorbLegacy(files: Seq[String]): Unit = state.synchronized {
    val (seen, maxGen) = state
    val fresh = files.filterNot(seen)
    if (fresh.nonEmpty) {
      val gen = maxGen.incrementAndGet()
      writeLog(fs, gen, fresh.map(f => f -> valuesFromPath(f)))
      fresh.foreach(seen += _)
    }
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """\{\s*"gen"\s*:\s*(\d+)\s*\}""".r
    val t = json.trim
    t match {
      case m(g) => GenOffset(g.toLong)
      case _ if t.startsWith("[") =>
        // pre-r15 encoding: a flat JSON string array of file paths
        val items = scala.collection.mutable.ArrayBuffer[String]()
        val sb = new StringBuilder
        var inStr = false; var i = 0
        while (i < t.length) {
          val c = t.charAt(i)
          if (!inStr) { if (c == '"') inStr = true }
          else c match {
            case '\\' => sb.append(t.charAt(i + 1)); i += 1
            case '"'  => items += sb.toString; sb.clear(); inStr = false
            case o    => sb.append(o)
          }
          i += 1
        }
        absorbLegacy(items.toSeq)
        LegacyFilesOffset(items.toSeq, json)
      case _ => throw new IllegalStateException(
        s"unreadable sink-stream offset '$json'")
    }
  }

  /** Cumulative (file, tuple) entries through generation g. */
  private def entriesThrough(f: FileSystem, g: Long)
      : Seq[(String, Seq[String])] =
    (1L to g).flatMap { gen =>
      val p = new Path(logDir, gen.toString)
      if (!f.exists(p)) Seq.empty else readLog(f, p)
    }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val f = fs
    // (start, end] as file sets. The all-generation fast path reads
    // only logs s+1..e; a LEGACY endpoint (one-time, post-upgrade)
    // resolves against raw file sets so the delta is exact whatever
    // grain the absorb landed in.
    val live: Seq[(String, Seq[String])] = (start, end) match {
      case (GenOffset(s), GenOffset(e)) =>
        (s + 1 to e).flatMap { g =>
          val p = new Path(logDir, g.toString)
          if (!f.exists(p)) Seq.empty else readLog(f, p)
        }
      case _ =>
        val startSet: Set[String] = start match {
          case GenOffset(s) => entriesThrough(f, s).map(_._1).toSet
          case LegacyFilesOffset(fl, _) => fl.toSet
          case o => throw new IllegalStateException(s"unexpected offset $o")
        }
        val endEntries: Seq[(String, Seq[String])] = end match {
          case GenOffset(e) => entriesThrough(f, e)
          case LegacyFilesOffset(fl, _) =>
            fl.map(file => file -> valuesFromPath(file))
          case o => throw new IllegalStateException(s"unexpected offset $o")
        }
        endEntries.filterNot { case (file, _) => startSet(file) }
    }
    val present = live
      .filter { case (file, values) =>
        keepTuple(values) && f.exists(new Path(file)) }
    // FILE SKIPPING on the tail, same contract as the batch scan: the
    // query's data-column comparisons stay residual, so dropping a
    // provably-excluded file removes only rows the filter would
    // discard anyway — a replay without stats (vacuumed manifests)
    // reads the file and post-scan-filters to the identical output
    val wantBloom = SinkFileSkip.wantsBloom(skipFilters)
    val kept =
      if (skipFilters.isEmpty) present
      else present.groupBy(t => new Path(t._1).getParent).toSeq
        .flatMap { case (dir, inDir) =>
          val stats = SinkStats.readDir(f, dir)
          val blooms =
            if (wantBloom) SinkBlooms.readDir(f, dir)
            else Map.empty[String,
              Map[String, org.apache.spark.util.sketch.BloomFilter]]
          inDir.filter { case (file, _) =>
            stats.get(new Path(file).getName)
              .forall(st => skipFilters.forall(
                SinkFileSkip.mayMatch(_, st.cols))) &&
              blooms.get(new Path(file).getName).forall(bm =>
                skipFilters.forall(SinkFileSkip.mayMatchBloom(_, bm)))
          }
        }
    // byte-range carving, same contract as the batch scan: a giant
    // epoch file must not become one task. Deterministic under replay
    // because published files are immutable — the same file always
    // carves into the same ranges
    val keyTypes = partCols.map(c => fullSchema(c).dataType)
    val maxSplit = SinkSplitConf.maxSplitBytes(SparkSession.active)
    kept.sortBy(_._1)
      .flatMap { case (file, values) =>
        val len = f.getFileStatus(new Path(file)).getLen
        if (len <= maxSplit)
          Seq(SinkFileSplit(file, values, keyTypes): InputPartition)
        else (0L until len by maxSplit).map(s =>
          SinkFileSplit(file, values, keyTypes,
            s, math.min(maxSplit, len - s)): InputPartition)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionedSinkReaderFactory(fullSchema, required, partCols,
      PartitionedSinkWriterFactory.sessionConf(), fieldIds,
      skipFilters.toSeq)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One scan task: a whole file (default) or a byte range of one.
  * `length = Long.MaxValue` means "through end of file" — the reader
  * clamps to the actual file length with saturating arithmetic.
  * `extras` are split-level CONSTANT columns beyond the partition
  * tuple (raw string renderings, cast by the reader like partition
  * values) — the change-feed source rides them for `_change_type` /
  * `_commit_version`.
  */
private[sources] case class SinkFileSplit(file: String, partValues: Seq[String],
                                 keyTypes: Seq[DataType],
                                 start: Long = 0L,
                                 length: Long = Long.MaxValue,
                                 extras: Seq[(String, String)] = Seq.empty,
                                 inlineParts: Boolean = false,
                                 relPath: String = "",
                                 delManifests: Seq[String] = Seq.empty,
                                 invertDeletes: Boolean = false)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow.fromSeq(partValues.zip(keyTypes).map { case (v, t) =>
      PartitionedSinkReader.castValue(v, t) })
}

/** Readers expose the CURRENT row's stable in-file position (the
  * `_pos` identity) so the position-delete anti-filter can wrap any
  * format's reader without knowing its decode.
  */
private[sources] trait HasRowPos {
  def currentRowPos: Long
}

private class PartitionedSinkReaderFactory(
    fullSchema: StructType, required: StructType, partCols: Seq[String],
    conf: org.apache.spark.util.SerializableConfiguration,
    fieldIds: Map[String, Int] = Map.empty,
    skipFilters: Seq[Filter] = Seq.empty,
    columnar: Boolean = false)
    extends PartitionReaderFactory {
  // per-FILE format dispatch (by extension): a table whose
  // `graft.format` changed mid-life, or a feed mixing table files with
  // spark-written change files, reads correctly file by file
  override def createReader(split: InputPartition): PartitionReader[InternalRow] = {
    val s = split.asInstanceOf[SinkFileSplit]
    val base: PartitionReader[InternalRow] with HasRowPos =
      if (s.file.endsWith(".parquet"))
        new SinkParquetReader(s, fullSchema, required, partCols, conf,
          fieldIds, skipFilters)
      else
        new PartitionedSinkReader(s, fullSchema, required, partCols, conf)
    if (s.delManifests.isEmpty) base
    else new PositionFilterReader(base, s, conf)
  }

  // VECTORIZED path: Spark requires all partitions of a scan to agree
  // on columnar-vs-row, so the SCAN decides once (every split a
  // parquet file with no merge-on-read deletes) and the factory
  // answers uniformly
  override def supportColumnarReads(split: InputPartition): Boolean = columnar

  override def createColumnarReader(split: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val s = split.asInstanceOf[SinkFileSplit]
    new SinkParquetColumnarReader(s, fullSchema, required, partCols, conf,
      fieldIds, skipFilters)
  }
}

/** MERGE-ON-READ anti-filter: drop the rows whose (file, pos) identity
  * appears in the split's active position-delete manifests (or — in
  * the change feed's `invertDeletes` mode — emit EXACTLY those rows).
  * Executor-side: each split loads only its own file's positions from
  * the per-commit manifests, so the driver never holds delete state.
  */
private class PositionFilterReader(
    inner: PartitionReader[InternalRow] with HasRowPos,
    split: SinkFileSplit,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private lazy val positions: java.util.HashSet[java.lang.Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new Path(split.file).toUri, conf.value)
    SinkDeletes.positionsFor(fs, split.delManifests, split.relPath)
  }
  override def next(): Boolean = {
    while (inner.next()) {
      if (positions.contains(inner.currentRowPos) == split.invertDeletes)
        return true
    }
    false
  }
  override def get(): InternalRow = inner.get()
  override def close(): Unit = inner.close()
}

/** Line reader for one staged-then-published TSV file: split on tab,
  * decode only the REQUIRED ordinals (TsvCodec unescape for strings,
  * straight parses for numerics, `\N` → null), fill the partition
  * columns from the split's constant tuple.
  */
private class PartitionedSinkReader(
    split: SinkFileSplit, fullSchema: StructType, required: StructType,
    partCols: Seq[String],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] with HasRowPos {

  /** `_pos` of the current row: byte offset of its line's first byte. */
  private var lastPos: Long = -1L
  override def currentRowPos: Long = lastPos

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

  // the file carries the data fields in fullSchema order MINUS the
  // partition columns (ALL columns when the split says the partition
  // values are inline — change files carry them as ordinary cells)
  private val dataFields =
    if (split.inlineParts) fullSchema.fields
    else fullSchema.fields.filter(f => !partCols.contains(f.name))
  // per-partition-column constants from the split's tuple
  private val partValues: Map[String, Any] =
    if (split.inlineParts) Map.empty
    else partCols.zip(split.partValues).map { case (c, v) =>
      c -> PartitionedSinkReader.castValue(v, fullSchema(c).dataType)
    }.toMap
  /** Sentinel file-column indexes in [[plan]]: -1 = split constant,
    * -2 = the per-row `_pos` metadata value (the line's byte offset).
    */
  private final val ConstIdx = -1
  private final val PosIdx = -2
  // required ordinal -> (file column index | a sentinel: partition
  // cols from the split's tuple, the `_file`/`_pos` metadata columns
  // from the split/reader — a DATA column with the same name wins,
  // matching Spark's conflict rule for metadata columns)
  private val plan: Array[(Int, DataType, Any)] = required.fields.map { f =>
    if (partValues.contains(f.name)) (ConstIdx, f.dataType, partValues(f.name))
    else {
      val di = dataFields.indexWhere(_.name == f.name)
      lazy val extra = split.extras.find(_._1 == f.name)
      if (di < 0 && extra.isDefined)
        (ConstIdx, f.dataType,
          PartitionedSinkReader.castValue(extra.get._2, f.dataType))
      else if (di < 0 && f.name == SinkMeta.FileCol)
        (ConstIdx, StringType, UTF8String.fromString(split.file))
      else if (di < 0 && f.name == SinkMeta.PosCol)
        (PosIdx, LongType, null)
      else (di, f.dataType, null)
    }
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
    plan.foreach { case (i, _, _) => if (i >= 0) a(i) = true }
    a
  }

  private def cast(s: String, dt: DataType): Any =
    PartitionedSinkReader.castValue(s, dt)

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (pos > end) return false // next line starts past this range
    val lineStart = pos // `_pos`: byte offset of the line's first byte
    val n = lineReader.readLine(text)
    if (n == 0) return false // end of file
    pos += n
    lastPos = lineStart
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
    val values = plan.map { case (idx, dt, const) =>
      if (idx == PosIdx) lineStart
      else if (idx < 0) const
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
  * literal of an unhandled type all answer "may match" (scan the
  * file). The one aggressive-but-sound case: a column recorded
  * ALL-NULL can never satisfy a comparison (SQL: NULL cmp x is not
  * true), so the file skips for any of the handled predicates.
  * NUMERIC comparison is BigDecimal (exact for every Long and for the
  * round-tripped Double/Float renderings the writer emits — no 2^53
  * float-widening trap). STRING comparison is binary UTF-8
  * (UTF8String — the engine's own ordering; Java's UTF-16 char order
  * disagrees above the BMP) against the truncated prefix bounds of
  * [[SinkStrBounds]], whose widening makes every decision here sound:
  * the recorded min ≤ true min and recorded max ≥ true max, so a
  * proof of exclusion against the recorded range is a proof against
  * the true one.
  */
private[sources] object SinkFileSkip {
  private def big(s: String): Option[java.math.BigDecimal] =
    try Some(new java.math.BigDecimal(s))
    catch { case _: NumberFormatException => None }

  /** compareTo results of (recorded min vs literal, recorded max vs
    * literal), in the literal's type system; None = incomparable
    * (scan).
    */
  private def rel(mnS: String, mxS: String, v: Any): Option[(Int, Int)] =
    v match {
      case n: java.lang.Number =>
        (big(mnS), big(mxS), big(n.toString)) match {
          case (Some(mn), Some(mx), Some(b)) =>
            Some((mn.compareTo(b), mx.compareTo(b)))
          case _ => None
        }
      case s: String =>
        val b = UTF8String.fromString(s)
        Some((UTF8String.fromString(mnS).compareTo(b),
          UTF8String.fromString(mxS).compareTo(b)))
      case u: UTF8String =>
        Some((UTF8String.fromString(mnS).compareTo(u),
          UTF8String.fromString(mxS).compareTo(u)))
      case _ => None
    }

  private def cmp(stats: Map[String, Option[(String, String)]], c: String,
                  v: Any)(sat: (Int, Int) => Boolean): Boolean =
    stats.get(c) match {
      case None => true // no stats for the column: must scan
      case Some(None) => false // all values NULL: no comparison matches
      case Some(Some((mnS, mxS))) =>
        Option(v).flatMap(rel(mnS, mxS, _)) match {
          case Some((cMn, cMx)) => sat(cMn, cMx)
          case None => true
        }
    }

  /** Do any of the skip filters need a bloom probe? (Blooms answer
    * only point predicates — load the `_bloom-` manifests for exactly
    * the scans that can use them.)
    */
  def wantsBloom(filters: Array[Filter]): Boolean = filters.exists {
    case _: EqualTo | _: In => true
    case _ => false
  }

  /** Bloom-filter rendition of [[mayMatch]] for point predicates:
    * false = the column's per-file filter proves the value(s) absent
    * (no false negatives by Bloom construction — a "maybe" scans).
    * Columns without a filter, non-point predicates, and literal
    * types the writer never hashed all answer true (scan).
    */
  def mayMatchBloom(f: Filter,
                    blooms: Map[String, org.apache.spark.util.sketch.BloomFilter])
      : Boolean = {
    def probe(bf: org.apache.spark.util.sketch.BloomFilter, v: Any): Boolean =
      v match {
        case null => true
        case n: java.lang.Long => bf.mightContainLong(n)
        case n: java.lang.Integer => bf.mightContainLong(n.longValue)
        case n: java.lang.Short => bf.mightContainLong(n.longValue)
        case n: java.lang.Byte => bf.mightContainLong(n.longValue)
        case s: String => bf.mightContainString(s)
        case u: UTF8String => bf.mightContainString(u.toString)
        case _ => true
      }
    f match {
      case EqualTo(c, v) => blooms.get(c).forall(probe(_, v))
      case In(c, vs) => blooms.get(c) match {
        case None => true
        case Some(bf) =>
          vs == null || vs.isEmpty || vs.exists(probe(bf, _))
      }
      case _ => true
    }
  }

  /** false = the file provably contains no matching row. */
  def mayMatch(f: Filter,
               stats: Map[String, Option[(String, String)]]): Boolean =
    f match {
      case GreaterThan(c, v) => cmp(stats, c, v)((_, cMx) => cMx > 0)
      case GreaterThanOrEqual(c, v) => cmp(stats, c, v)((_, cMx) => cMx >= 0)
      case LessThan(c, v) => cmp(stats, c, v)((cMn, _) => cMn < 0)
      case LessThanOrEqual(c, v) => cmp(stats, c, v)((cMn, _) => cMn <= 0)
      case EqualTo(c, v) => cmp(stats, c, v)(
        (cMn, cMx) => cMn <= 0 && cMx >= 0)
      case In(c, vs) =>
        if (vs == null) true
        else vs.exists(v => cmp(stats, c, v)(
          (cMn, cMx) => cMn <= 0 && cMx >= 0))
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
