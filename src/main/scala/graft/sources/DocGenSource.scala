package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-document DataSource V2 — the engine's own
  * `format("graft.sources.DocGenSource")` table (cf. the reference's
  * external REST/CSV/JSON sources under reference src/jobs — all
  * driver-side; this one is a first-class connector the PLANNER can
  * reason about).
  *
  * Why it exists: a load generator / test fixture whose rows are a
  * pure function of `doc_id`, so any slice of it can be regenerated on
  * any executor without I/O — and, because the generating arithmetic
  * is four integer ops and a word table, the whole table is ALSO
  * expressible as one SQL query, which keeps even the custom source
  * under the DuckDB oracle gate.
  *
  * Scale/planner story (the point of doing this as DSv2 rather than
  * `spark.range(...).select(...)`):
  *   - `SupportsPushDownRequiredColumns`: generation is column-pruned —
  *     a `select(doc_id)` never builds a single text string (the scan's
  *     `readSchema()` is the proof, plan-asserted in DocGenSourceSpec);
  *   - `SupportsPushDownFilters`: doc_id range predicates narrow the
  *     generated [lo, hi) BEFORE partition planning — `doc_id < 100`
  *     generates 100 rows, not N rows filtered to 100, and the filter
  *     is reported fully-handled so no FilterExec remains in the plan;
  *   - work splits into `parts` equal id ranges; each partition reader
  *     is O(its slice), no skew, no shuffle, no driver involvement.
  */
class DocGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DocGenTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(8))
}

object DocGenSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  // 64 words; the SQL mirror must list the identical array (see
  // wordsSqlArray). Fixed-width-free plain words keep n_chars honest.
  val words: IndexedSeq[String] = IndexedSeq(
    "spark", "scan", "join", "sort", "hash", "merge", "batch", "stream",
    "window", "shuffle", "filter", "select", "group", "order", "union", "limit",
    "table", "column", "row", "key", "value", "index", "range", "bucket",
    "plan", "query", "stage", "task", "core", "node", "disk", "cache",
    "read", "write", "load", "store", "map", "reduce", "fold", "scanff",
    "token", "gram", "hashx", "band", "sig", "dup", "near", "exact",
    "small", "large", "fast", "slow", "hot", "cold", "wide", "deep",
    "alpha", "beta", "gamma", "delta", "omega", "sigma", "theta", "kappa")

  private val langs = IndexedSeq("en", "de", "es", "fr", "zh")

  /** The generating arithmetic both engines run: pre-mod keeps the
    * multiply in Long range (the Curation.bucketHash discipline).
    */
  def wordIdx(id: Long, i: Long): Int =
    ((((id * 131 + i) % 999999937L) * 2654435761L) % 999999937L % 64L).toInt

  def nWords(id: Long): Long = 10 + id % 20

  def textOf(id: Long): String =
    (0L until nWords(id)).map(i => words(wordIdx(id, i))).mkString(" ")

  def langOf(id: Long): String = langs((id % 5).toInt)

  def sourceOf(id: Long): String = "src" + (id % 20)

  /** DuckDB mirror of the full table over [0, rows) — interpolate into
    * oracle SQL so the custom source itself stays oracle-gated.
    */
  def oracleSql(rows: Long): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ",", "]")
    s"""
      WITH ids AS (SELECT unnest(range(0, $rows)) AS id),
      expl AS (SELECT id, unnest(range(0, 10 + id % 20)) AS i FROM ids),
      w AS (SELECT id, i,
                   $arr[CAST(((id*131 + i) % 999999937) * 2654435761
                             % 999999937 % 64 + 1 AS INTEGER)] AS wd
            FROM expl),
      t AS (SELECT id, string_agg(wd, ' ' ORDER BY i) AS text FROM w GROUP BY id)
      SELECT id AS doc_id, text,
             ['en','de','es','fr','zh'][CAST(id % 5 + 1 AS INTEGER)] AS lang,
             'src' || CAST(id % 20 AS VARCHAR) AS source,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM t ORDER BY doc_id"""
  }
}

private class DocGenTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"docgen($rows)"
  override def schema(): StructType = DocGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, parts)
}

private class DocGenScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.connector.expressions.NamedReference

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = DocGenSource.schema
  private var pushedAgg: Option[Aggregation] = None

  // COUNT(*) / MIN(doc_id) / MAX(doc_id) are pure range arithmetic —
  // answered from the (already filter-narrowed) [lo, hi) without
  // generating a single row. Complete pushdown: Spark plans NO
  // aggregate at all, just this scan's one-row answer.
  private def pushable(agg: Aggregation): Boolean = {
    def isDocId(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case f: NamedReference => f.fieldNames.toSeq == Seq("doc_id")
        case _ => false
      }
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall {
      case _: CountStar => true
      case m: Min => isDocId(m.column)
      case m: Max => isDocId(m.column)
      case _ => false
    }
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean = pushable(agg)
  override def pushAggregation(agg: Aggregation): Boolean =
    if (pushable(agg)) { pushedAgg = Some(agg); true } else false

  // LIMIT composes with the filter-narrowed range: rows are generated
  // in id order, so the first n of [lo, hi) is just [lo, lo+n) — the
  // generator never produces a row the limit would drop. Fully pushed
  // (isPartiallyPushed = false): Spark keeps its own Limit node for
  // plan-shape reasons but it passes everything through.
  override def pushLimit(n: Int): Boolean = {
    hi = math.min(hi, math.max(lo, 0L) + n)
    true
  }
  override def isPartiallyPushed(): Boolean = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case EqualTo("doc_id", _: Long) => true
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case _ => false
    }
    handled.foreach {
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = handled
    residual // fully handled: nothing left for a FilterExec
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val l = math.max(lo, 0L)
    val h = math.max(hi, l)
    pushedAgg match {
      case Some(agg) => new DocGenAggScan(l, h, agg)
      case None => new DocGenScan(l, h, parts, required, pushed)
    }
  }
}

/** One-row answer for a completely-pushed COUNT(*)/MIN/MAX(doc_id)
  * aggregation: the range IS the statistics.
  */
private class DocGenAggScan(
    lo: Long, hi: Long,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
  private val empty = hi <= lo
  private val answers: Seq[Any] = agg.aggregateExpressions.toSeq.map {
    case _: CountStar => hi - lo
    case _: Min => if (empty) null else lo
    case _: Max => if (empty) null else hi - 1
    case other => throw new IllegalStateException(s"unpushable agg: $other")
  }
  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.toSeq.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String = s"DocGenAggScan [$lo, $hi) $agg"
  override def planInputPartitions(): Array[InputPartition] =
    Array(DocGenPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      private val row = answers
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = InternalRow.fromSeq(row)
          override def close(): Unit = ()
        }
    }
}

private class DocGenScan(lo: Long, hi: Long, parts: Int,
                         required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  /** Exact statistics — the generator knows its cardinality, so the
    * optimizer's broadcast/join decisions see the FILTER-NARROWED row
    * count, not a guess (the capability file sources earn from
    * footer metadata; here it is free). Bytes ≈ rows × the mean width
    * of the REQUIRED columns (~8 per long, ~120 for text).
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(hi - lo, 0L)
    private val width = required.fields.map(_.dataType match {
      case LongType => 8L
      case _ => 120L
    }).sum.max(1L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * width)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }
  override def description(): String =
    s"DocGenScan [$lo, $hi) PushedFilters: ${pushed.mkString("[", ", ", "]")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val p = math.min(parts.toLong, n).toInt
      Array.tabulate(p) { i =>
        DocGenPartition(lo + n * i / p, lo + n * (i + 1) / p)
      }
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required)
}

private case class DocGenPartition(start: Long, end: Long) extends InputPartition

private class DocGenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocGenPartition]
    new DocGenReader(p.start, p.end, required)
  }
}

/** Generates only the REQUIRED columns: the pruned scan never builds
  * text strings it will not emit (the point of pushing pruning into
  * the source instead of projecting after a full generate).
  */
private class DocGenReader(start: Long, end: Long, required: StructType)
    extends PartitionReader[InternalRow] {
  private var id = start - 1
  private val fields: Array[String] = required.fieldNames
  override def next(): Boolean = { id += 1; id < end }
  override def get(): InternalRow = {
    // text is built at most once per row even if n_chars is also
    // requested; neither is built when neither is required
    lazy val text = DocGenSource.textOf(id)
    InternalRow.fromSeq(fields.toSeq.map {
      case "doc_id" => id
      case "text" => UTF8String.fromString(text)
      case "lang" => UTF8String.fromString(DocGenSource.langOf(id))
      case "source" => UTF8String.fromString(DocGenSource.sourceOf(id))
      case "n_chars" => text.length.toLong
    })
  }
  override def close(): Unit = ()
}
