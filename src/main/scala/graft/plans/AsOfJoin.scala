package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native AS-OF JOIN — the custom whole-operator path of the extension
  * ladder (expression < logical node + strategy + physical node): a
  * `LogicalPlan` the planner turns into a dedicated merge-join
  * `SparkPlan`, injected via `SparkSessionExtensions`
  * (graft.GraftExtensions).
  *
  * Semantics (matches graft.ops.TemporalOps.asofJoin): every left row
  * gains the payload of the LATEST right row with `rightTs <= leftTs`
  * on the same key (ties include the right row), or NULLs when no
  * match exists; `forward = true` flips to the EARLIEST right row with
  * `rightTs >= leftTs`. NULL keys and NULL timestamps match nothing;
  * right rows with NULL timestamps are never candidates.
  *
  * The join columns are stored BY NAME and resolved against the live
  * child outputs on every access: when both sides derive from the same
  * source DataFrame, the analyzer's DeduplicateRelations re-mints the
  * right subtree's exprIds AFTER this node is constructed — captured
  * Attribute objects would silently keep the left side's ids (the
  * r13 bug this replaced: the right child got column-pruned down to
  * the payload because the stored "right" keys resolved to the left).
  * Name resolution recomputes from `children` post-rewrite, so the
  * node stays correct under any analyzer/optimizer re-identification.
  *
  * Why a physical operator when the union+carry-forward spelling
  * (TemporalOps.asofJoin) already avoids the quadratic range join:
  * the declarative spelling must UNION both sides into one relation
  * and run a carry-forward WINDOW over the merged timeline — at
  * 100 TB that is a shuffle of left+right TOGETHER, a sort of the
  * merged width (left columns padded onto every right row and vice
  * versa), and window-function execution per row. This operator keeps
  * the sides separate: each shuffles ONCE on its own key (the
  * distribution/ordering contract below — Catalyst's EnsureRequirements
  * plans the exchanges and sorts, and co-partitions the sides), and
  * the per-partition merge is a single forward pass with one pointer
  * per side — no merged relation, no window state, no padding. Sorted
  * inputs stream; memory is O(1) per partition beyond the sort.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    keyNames: Seq[String],
    leftTsName: String,
    rightTsName: String,
    payloadNames: Seq[String],
    outAttrs: Seq[Attribute],
    forward: Boolean,
    broadcast: Boolean = false) extends BinaryNode {
  require(keyNames.nonEmpty)
  require(outAttrs.size == payloadNames.size + 1,
    "outAttrs = prefixed payload columns + the matched timestamp")

  private def byName(p: LogicalPlan, n: String): Attribute = {
    val hits = p.output.filter(_.name == n)
    require(hits.size == 1,
      s"as-of column $n must be unique in ${p.output.map(_.name).mkString(", ")}")
    hits.head
  }
  def leftKeyAttrs: Seq[Attribute] = keyNames.map(byName(left, _))
  def rightKeyAttrs: Seq[Attribute] = keyNames.map(byName(right, _))
  def leftTsAttr: Attribute = byName(left, leftTsName)
  def rightTsAttr: Attribute = byName(right, rightTsName)
  def payloadAttrs: Seq[Attribute] = payloadNames.map(byName(right, _))

  override def output: Seq[Attribute] = left.output ++ outAttrs
  // outAttrs are minted HERE, not read from the children
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  // name-resolved join inputs — without this, column pruning sees no
  // references into the children and strips the keys/timestamps
  override lazy val references: AttributeSet =
    AttributeSet((leftKeyAttrs :+ leftTsAttr) ++
      (rightKeyAttrs :+ rightTsAttr) ++ payloadAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** Build the logical node: validates the named columns against the
    * child outputs and mints the output attributes (nullable — a left
    * row may have no match).
    */
  def resolved(left: LogicalPlan, right: LogicalPlan, keys: Seq[String],
               leftTs: String, rightTs: String, rightPayload: Seq[String],
               prefix: String, forward: Boolean,
               broadcast: Boolean = false): AsOfJoinPlan = {
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    val rp = rightPayload.map(attr(right, _))
    val rt = attr(right, rightTs)
    // the execs compare key bytes / read timestamp values ACROSS sides
    // (UnsafeRow comparison in the broadcast probe, one shared ordering
    // in the merge) — a type mismatch would not error, it would silently
    // match nothing (int-vs-long keys) or mis-order (mixed ts types).
    // Unlike a DataFrame equi-join there is no analyzer coercion pass
    // over this node, so demand identical types and tell the caller to
    // cast explicitly.
    keys.foreach { k =>
      val (lk, rk) = (attr(left, k), attr(right, k))
      require(lk.dataType == rk.dataType,
        s"as-of key $k type mismatch: left ${lk.dataType.sql} vs " +
          s"right ${rk.dataType.sql} — cast the sides to a common type")
    }
    val lt = attr(left, leftTs)
    require(lt.dataType == rt.dataType,
      s"as-of timestamp type mismatch: $leftTs ${lt.dataType.sql} vs " +
        s"$rightTs ${rt.dataType.sql} — cast the sides to a common type")
    val out = (rp :+ rt).zip(rightPayload :+ "ts").map { case (a, n) =>
      AttributeReference(s"$prefix$n", a.dataType, nullable = true)()
    }
    AsOfJoinPlan(left, right, keys, leftTs, rightTs, rightPayload, out,
      forward, broadcast)
  }
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec (attributes resolved from
  * the final child outputs at planning time).
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan if p.broadcast =>
      AsOfBroadcastJoinExec(planLater(p.left), planLater(p.right),
        p.leftKeyAttrs, p.rightKeyAttrs, p.leftTsAttr, p.rightTsAttr,
        p.payloadAttrs, p.outAttrs, p.forward) :: Nil
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right), p.leftKeyAttrs,
        p.rightKeyAttrs, p.leftTsAttr, p.rightTsAttr, p.payloadAttrs,
        p.outAttrs, p.forward) :: Nil
    case _ => Nil
  }
}

/** Broadcast as-of: the fact-vs-dimension rendition. When the right
  * side is dimension-sized (prices, exchange rates, config history),
  * the sorted-merge plan still shuffles AND sorts the fact side — at
  * 100 TB that is the whole cost. This exec instead declares
  * BroadcastDistribution on the right and NOTHING on the left: zero
  * exchanges and zero sorts on the fact side (pin: the left child
  * plans straight into the probe). Each task builds a per-key
  * ts-sorted index from the broadcast rows once, then answers every
  * left row with a binary search — O(log timeline) per row, fact
  * order preserved.
  */
/** Executor-local cache of built broadcast as-of indexes. Without it,
  * EVERY task re-hashes and re-sorts the whole broadcast relation
  * (`bc.value`) inside its own mapPartitions — bounded by the
  * dimension size, but a 100 TB fact side runs tens of thousands of
  * tasks per executor lifetime: 10⁴× redundant O(dim·log dim) work.
  * The cache is keyed on (broadcast id, key/ts ordinal positions) —
  * the same broadcast exchange can be reused (ReuseExchange) by two
  * different as-of joins with different join columns, which must not
  * collide. Access-ordered LRU bounded at [[MaxEntries]] so a
  * long-lived executor can't accumulate dead indexes; the pattern is
  * what HashedRelation's broadcast mode gets from the block manager.
  */
private[graft] object AsOfIndexCache {
  private val MaxEntries = 8
  // values are SoftReferences: a cached index is a full copy of a
  // broadcast dimension's rows, and streams that re-broadcast the dim
  // every trigger would otherwise pin MaxEntries historical snapshots
  // in executor memory for the JVM lifetime — soft values let the GC
  // reclaim stale indexes under pressure while keeping the hot ones
  private val cache =
    new java.util.LinkedHashMap[String, java.lang.ref.SoftReference[AnyRef]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.ref.SoftReference[AnyRef]])
          : Boolean =
        size() > MaxEntries
    }

  /** One entry per ACTUAL build (cache misses) — observable from specs
    * as "N partitions, 1 build per executor". Process-wide by design.
    */
  val builds = new java.util.concurrent.atomic.AtomicLong

  def getOrBuild(key: String, build: () => AnyRef): AnyRef =
    cache.synchronized {
      val ref = cache.get(key)
      val hit = if (ref != null) ref.get else null
      if (hit != null) hit
      else {
        val v = build()
        builds.incrementAndGet()
        cache.put(key, new java.lang.ref.SoftReference[AnyRef](v))
        v
      }
    }
}

/** Executor-side probe state shared by BOTH execution paths of the
  * broadcast as-of join (the iterator `doExecute` and the whole-stage
  * codegen `doConsume` call the same object): builds/caches the
  * per-key ts-sorted timeline index from the broadcast rows (via
  * [[AsOfIndexCache]] — once per executor), and answers point probes
  * with a binary search. Serializable so it ships in task closures and
  * in the codegen references array; the index itself is `@transient
  * lazy` and rebuilt (or cache-hit) executor-side. Key projections are
  * built from BOUND ordinals so the probe-side key row (boxed values
  * in key order) and the build-side key row (projected from the
  * broadcast rows) share one UnsafeRow binary layout.
  */
private[graft] class AsOfProbeHelper(
    bc: org.apache.spark.broadcast.Broadcast[Array[InternalRow]],
    val cacheKey: String,
    keyOrds: Array[Int],
    keyTypes: Array[org.apache.spark.sql.types.DataType],
    tsOrdinal: Int,
    tsType: org.apache.spark.sql.types.DataType,
    forward: Boolean,
    indexBuilds: SQLMetric,
    buildTime: SQLMetric) extends Serializable {

  import org.apache.spark.sql.catalyst.expressions.BoundReference

  @transient private lazy val tsOrd = TypeUtils.getInterpretedOrdering(tsType)

  /** Boxed-values → UnsafeRow with the index's key layout. */
  @transient private lazy val probeKeyProj =
    UnsafeProjection.create(keyTypes.zipWithIndex.map { case (t, i) =>
      BoundReference(i, t, nullable = true)
    }.toIndexedSeq)

  @transient lazy val index
      : java.util.HashMap[InternalRow, Array[(Any, InternalRow)]] =
    AsOfIndexCache.getOrBuild(cacheKey, { () =>
      val t0 = System.nanoTime()
      val rKeyProj = UnsafeProjection.create(
        keyOrds.zip(keyTypes).map { case (o, t) =>
          BoundReference(o, t, nullable = true)
        }.toIndexedSeq)
      val rTsProj = UnsafeProjection.create(
        Seq(BoundReference(tsOrdinal, tsType, nullable = true)))
      val built = new java.util.HashMap[InternalRow, Array[(Any, InternalRow)]]()
      val tmp = new java.util.HashMap[
        InternalRow, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]()
      bc.value.foreach { r =>
        val k = rKeyProj(r)
        val t = rTsProj(r)
        if (!k.anyNull && !t.isNullAt(0)) {
          val buf = tmp.computeIfAbsent(k.copy(),
            _ => scala.collection.mutable.ArrayBuffer.empty)
          buf += ((t.get(0, tsType), r))
        }
      }
      tmp.forEach { (k, buf) =>
        built.put(k, buf.sortBy(_._1)(tsOrd.asInstanceOf[Ordering[Any]]).toArray)
      }
      indexBuilds += 1
      buildTime += (System.nanoTime() - t0) / 1000000
      built
    }).asInstanceOf[java.util.HashMap[InternalRow, Array[(Any, InternalRow)]]]

  /** Binary search: backward = last ts <= lTs, forward = first >= lTs. */
  def search(timeline: Array[(Any, InternalRow)], tsVal: Any): InternalRow = {
    var lo = 0; var hi = timeline.length - 1; var hit = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = tsOrd.compare(timeline(mid)._1, tsVal)
      if (!forward) {
        if (c <= 0) { hit = mid; lo = mid + 1 } else hi = mid - 1
      } else {
        if (c >= 0) { hit = mid; hi = mid - 1 } else lo = mid + 1
      }
    }
    if (hit < 0) null else timeline(hit)._2
  }

  /** Probe with an already-projected key row (iterator path). */
  def probeKey(key: InternalRow, tsVal: Any): InternalRow = {
    val timeline = index.get(key)
    if (timeline == null) null else search(timeline, tsVal)
  }

  /** Probe with boxed key values + boxed ts (codegen path; nulls are
    * filtered by the generated guard before this call).
    */
  def probe(keys: Array[AnyRef], ts: AnyRef): InternalRow =
    probeKey(probeKeyProj(new GenericInternalRow(
      keys.asInstanceOf[Array[Any]])), ts)
}

case class AsOfBroadcastJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    outAttrs: Seq[Attribute],
    forward: Boolean) extends BinaryExecNode
    with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched rows"),
    "indexBuilds" -> SQLMetrics.createMetric(sparkContext,
      "broadcast index builds (per executor, not per task)"),
    "buildTime" -> SQLMetrics.createTimingMetric(sparkContext,
      "time building broadcast index"))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution,
    org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
      org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfBroadcastJoinExec =
    copy(left = newLeft, right = newRight)

  /** Driver-side: trigger the broadcast and package everything the
    * executor probe needs. Called from doExecute AND doConsume
    * (executeBroadcast is idempotent — the exchange caches its future).
    */
  private def probeHelper: AsOfProbeHelper = {
    val rOut = right.output
    val bc = right.executeBroadcast[Array[InternalRow]]()
    // cache key: same broadcast + same join-column positions = same
    // index (direction and payload don't shape it — rows are stored
    // whole and the sorted timeline serves both search directions)
    val cacheKey = s"${bc.id}:${rightKeys.map(rOut.indexOf).mkString(",")}:" +
      s"${rOut.indexOf(rightTs)}"
    new AsOfProbeHelper(bc, cacheKey,
      rightKeys.map(rOut.indexOf).toArray,
      leftKeys.map(_.dataType).toArray,
      rOut.indexOf(rightTs), leftTs.dataType, forward,
      longMetric("indexBuilds"), longMetric("buildTime"))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val tsType = leftTs.dataType
    val nOut = outAttrs.size
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val lt = leftTs
    val rp = rightPayload; val rt = rightTs
    val out = output
    val helper = probeHelper
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val lTsProj = UnsafeProjection.create(Seq(lt), lOut)
      val packProj = UnsafeProjection.create(rp :+ rt, rOut)
      val resultProj = UnsafeProjection.create(out, out)
      val nulls = new GenericInternalRow(nOut)
      val joined = new JoinedRow
      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTsRow = lTsProj(l)
        val matched: InternalRow =
          if (lKey.anyNull || lTsRow.isNullAt(0)) null
          else helper.probeKey(lKey, lTsRow.get(0, tsType))
        numOutputRows += 1
        if (matched != null) numMatched += 1
        resultProj(joined(l, if (matched == null) nulls else packProj(matched)))
      }
    }
  }

  // ---- whole-stage codegen: the probe fuses into the fact-side
  // pipeline (scan → filter → THIS → parent all in one generated
  // function — the iterator rendition above remains the fallback
  // Spark uses when codegen is off or the stage fails to compile) ----

  // exactly one output row per streamed row (left-outer point lookup),
  // so result-copy semantics are the streamed side's — the binary-node
  // default refuses to guess for two children
  override def needCopyResult: Boolean =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport]
      .needCopyResult

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].inputRDDs()

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext): String =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport]
      .produce(ctx, this)

  override def doConsume(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      input: Seq[org.apache.spark.sql.catalyst.expressions.codegen.ExprCode],
      row: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): String = {
    import org.apache.spark.sql.catalyst.expressions.BindReferences
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, ExprCode, JavaCode}
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val numOutput = metricTerm(ctx, "numOutputRows")
    val numMatchedM = metricTerm(ctx, "numMatched")
    val helperRef = ctx.addReferenceObj("asofProbe", probeHelper,
      classOf[AsOfProbeHelper].getName)
    // evaluate the probe inputs from the incoming column variables
    ctx.currentVars = input
    val keyEvs = leftKeys.map(a =>
      BindReferences.bindReference(a: org.apache.spark.sql.catalyst.expressions.Expression,
        left.output).genCode(ctx))
    val tsEv = BindReferences.bindReference(
      leftTs: org.apache.spark.sql.catalyst.expressions.Expression,
      left.output).genCode(ctx)
    def boxed(dt: org.apache.spark.sql.types.DataType, v: String): String =
      if (CodeGenerator.isPrimitiveType(dt)) s"${CodeGenerator.boxedType(dt)}.valueOf($v)"
      else v
    val anyNull = (keyEvs :+ tsEv).map(_.isNull.toString)
      .filter(_ != "false") match {
      case Nil => "false"
      case xs => xs.mkString(" || ")
    }
    val matched = ctx.freshName("asofMatched")
    val keysArr = ctx.freshName("asofKeys")
    val fillKeys = leftKeys.zip(keyEvs).zipWithIndex.map {
      case ((a, ev), i) => s"$keysArr[$i] = ${boxed(a.dataType, ev.value.toString)};"
    }.mkString("\n")
    // payload columns read from the matched broadcast row (broadcast
    // rows are long-lived; object values like UTF8String are safe to
    // hand to the parent without copy)
    val rOut = right.output
    val payloadCodes = (rightPayload :+ rightTs).zip(outAttrs).map {
      case (src, outA) =>
        val ord = rOut.indexOf(src)
        val jt = CodeGenerator.javaType(outA.dataType)
        val isNullVar = ctx.freshName("asofOutIsNull")
        val valVar = ctx.freshName("asofOutVal")
        val c =
          code"""
            |boolean $isNullVar = ($matched == null) || $matched.isNullAt($ord);
            |$jt $valVar = $isNullVar ? ${CodeGenerator.defaultValue(outA.dataType)}
            |  : (${CodeGenerator.getValue(matched, outA.dataType, ord.toString)});
          """.stripMargin
        ExprCode(c, JavaCode.isNullVariable(isNullVar),
          JavaCode.variable(valVar, outA.dataType))
    }
    // emit the payload evaluations here (they must sit in this scope —
    // they read $matched), then hand consume() already-evaluated vars:
    // clearing each block to EmptyBlock is the evaluateVariables
    // contract that stops the parent re-emitting the same declarations
    // (a duplicate emission is a janino "Redefinition of local
    // variable" compile failure → silent interpreted fallback)
    val payloadEval = payloadCodes.map(_.code.toString).mkString("\n")
    payloadCodes.foreach(_.code =
      org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock)
    s"""
       |${keyEvs.map(_.code.toString).mkString("\n")}
       |${tsEv.code.toString}
       |InternalRow $matched = null;
       |if (!($anyNull)) {
       |  Object[] $keysArr = new Object[${leftKeys.size}];
       |  $fillKeys
       |  $matched = $helperRef.probe($keysArr,
       |    ${boxed(leftTs.dataType, tsEv.value.toString)});
       |}
       |$numOutput.add(1);
       |if ($matched != null) $numMatchedM.add(1);
       |$payloadEval
       |${consume(ctx, input ++ payloadCodes)}
     """.stripMargin
  }
}

/** Per-partition sorted merge. The scheduling contract does the heavy
  * lifting: requiredChildDistribution co-partitions both sides on the
  * join keys (one exchange each, planned by EnsureRequirements) and
  * requiredChildOrdering sorts each side by (keys, ts) — after which
  * the as-of match is a linear two-pointer walk per partition.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    outAttrs: Seq[Attribute],
    forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext,
      "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // ascending + nulls first on BOTH (keys, ts): null keys / null ts
  // group at the front of each run where the merge skips them
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val nOut = outAttrs.size
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTs; val rt = rightTs
    val rp = rightPayload
    val out = output
    val fwd = forward
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rt), rOut)
      val packProj = UnsafeProjection.create(rp :+ rt, rOut)
      val resultProj = UnsafeProjection.create(out, out)
      val keyOrds = keyTypes.map(TypeUtils.getInterpretedOrdering)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      def cmpKeys(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < keyOrds.length) {
          val an = a.isNullAt(i); val bn = b.isNullAt(i)
          val c =
            if (an && bn) 0 else if (an) -1 else if (bn) 1
            else keyOrds(i).compare(a.get(i, keyTypes(i)), b.get(i, keyTypes(i)))
          if (c != 0) return c
          i += 1
        }
        0
      }
      val nulls = new GenericInternalRow(nOut)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // backward state: the latest in-range right row for lastKey
      var lastMatch: InternalRow = null
      var lastKey: InternalRow = null
      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTsRow = lTsProj(l)
        val matched: InternalRow =
          if (lKey.anyNull || lTsRow.isNullAt(0)) null
          else {
            val lTsVal = lTsRow.get(0, tsType)
            // advance the right pointer to this left row's position
            var done = false
            while (!done && rBuf.hasNext) {
              val r = rBuf.head
              val rKey = rKeyProj(r)
              val c = cmpKeys(rKey, lKey)
              if (c < 0) { rBuf.next() }
              else if (c > 0) done = true
              else if (rKey.anyNull) { rBuf.next() } // null never matches
              else {
                val rTsRow = rTsProj(r)
                if (rTsRow.isNullAt(0)) { rBuf.next() } // nulls sort first; skip
                else {
                  val rTsVal = rTsRow.get(0, tsType)
                  if (!fwd && tsOrd.compare(rTsVal, lTsVal) <= 0) {
                    lastMatch = r.copy(); lastKey = rKey.copy(); rBuf.next()
                  } else if (fwd && tsOrd.compare(rTsVal, lTsVal) < 0) {
                    rBuf.next()
                  } else done = true
                }
              }
            }
            if (fwd) {
              // candidate = the row the pointer stopped on, if same key
              // (its ts is >= lTs by the walk above)
              if (rBuf.hasNext && {
                val rKey = rKeyProj(rBuf.head)
                !rKey.anyNull && cmpKeys(rKey, lKey) == 0 &&
                  !rTsProj(rBuf.head).isNullAt(0)
              }) rBuf.head else null
            } else if (lastMatch != null && cmpKeys(lastKey, lKey) == 0)
              lastMatch
            else null
          }
        numOutputRows += 1
        if (matched != null) numMatched += 1
        resultProj(joined(l, if (matched == null) nulls else packProj(matched)))
      }
    }
  }
}
