package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType}
import graft.functions.VectorExpressions.cosine_sim
import graft.functions.TopKAggregator

/** Vector similarity search over an `array<float>` embedding column.
  *
  * Layers:
  *   - cosine/dot as higher-order-function expressions in double
  *     precision (sequential left fold — deterministic order);
  *   - brute-force top-k: broadcast the probe set, score every
  *     candidate, rank via a single-pass top-k aggregation (shuffle is
  *     O(probes·k), never O(N)). O(N·Q) scoring — the correctness
  *     baseline, and the right answer when Q is small;
  *   - hyperplane-LSH buckets: 16 deterministic pseudo-random
  *     hyperplanes → 16-bit bucket key; candidates share the probe's
  *     bucket. Scales as a hash join on bucket keys;
  *   - IVF with label partitions: per-partition centroids, probe →
  *     nearest nProbe centroids → exact search inside those partitions
  *     only. The classic inverted-file trade: touch k/K of the data.
  */
object Similarity {

  /** Elementwise-double dot product, sequential fold (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Per-probe rank of scored candidates via the single-pass
    * `TopKAggregator` — partial buffers cap at k rows per partition per
    * probe, so the shuffle carries O(probes·k) rows no matter how many
    * candidates were scored. A `row_number() over (partition by probe)`
    * window would instead sort every probe's full candidate set in one
    * task — O(N) memory per probe and a straggler magnet at scale.
    *
    * Ordering contract (score DESC, id ASC) matches the aggregator's
    * `finish` sort, so results are bit-identical to the window rendition.
    * Expects `scored` to have columns (probe_id, score, idCol, ...).
    */
  private def rankTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored
      .groupBy(col("probe_id"))
      .agg(TopKAggregator.topk(k)(col("score"), col(idCol).cast("long")).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(
        col("probe_id"),
        (col("pos") + 1).cast(IntegerType).as("rank"),
        col("s.id").as("neighbor_id"),
        col("s.score").as("score"))

  /** Brute-force cosine top-k for each probe row.
    *
    * @param probes (probe_id, probe_vec); must be small enough to
    *               broadcast — at scale this is the query batch.
    */
  def bruteForceTopK(candidates: DataFrame, idCol: String, vecCol: String,
                     probes: DataFrame, k: Int): DataFrame = {
    val scored = candidates
      .join(broadcast(probes), col(idCol) =!= col("probe_id"))
      .withColumn("score", round(cosine_sim(col("probe_vec"), col(vecCol)), 6))
    rankTopK(scored, idCol, k)
  }

  /** Hard-negative mining: per probe, the top-k most similar vectors
    * with a DIFFERENT label — the contrastive-training move (the
    * negatives that are hardest to tell apart teach the most). Same
    * plan shape as [[bruteForceTopK]] (broadcast probe batch,
    * O(groups·k) top-k aggregation, no Window sort); the label
    * inequality rides the join condition, so excluded same-label rows
    * never reach the scorer.
    *
    * @param probes (probe_id, probe_vec, probe_label)
    */
  def hardNegatives(candidates: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, probes: DataFrame, k: Int): DataFrame = {
    val scored = candidates
      .join(broadcast(probes),
        col(idCol) =!= col("probe_id") && col(labelCol) =!= col("probe_label"))
      .withColumn("score", round(cosine_sim(col("probe_vec"), col(vecCol)), 6))
    rankTopK(scored, idCol, k)
  }

  /** Deterministic ±1 pseudo-random hyperplane sign for (plane, dim):
    * parity of xxhash64 — reproducible everywhere, no stored model.
    */
  private def planeSign(plane: Int, dimIdx: Column): Column =
    when(pmod(xxhash64(lit(plane), dimIdx), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Multi-table hyperplane-LSH assignment: `tables` independent hash
    * tables of `bits` hyperplanes each (table t uses planes t·bits …
    * t·bits+bits-1). All tables·bits sign sums run in ONE codegen'd
    * aggregation pass (map-side partials), then each row explodes to its
    * `tables` (htable, bucket) keys. Sums run in exact DECIMAL so
    * aggregation order can never flip a near-zero sign bit — bucket ids
    * are fully deterministic.
    *
    * Multiple tables are OR-amplification: a true neighbor is a
    * candidate if it collides in ANY table, which is what makes
    * hyperplane LSH usable on weakly-clustered (e.g. isotropic)
    * embeddings where a single table's recall collapses.
    */
  def lshAssignTables(df: DataFrame, idCol: String, vecCol: String,
                      tables: Int, bits: Int): DataFrame = {
    val exploded = df.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("dim", "x")))
    val sumCols = (0 until tables * bits).map(p =>
      sum(col("x").cast(DecimalType(28, 10)) * planeSign(p, col("dim")).cast(DecimalType(2, 0)))
        .as(s"__s$p"))
    val bucketOf = (t: Int) => (0 until bits)
      .map(b => when(col(s"__s${t * bits + b}") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    exploded.groupBy(col(idCol))
      .agg(sumCols.head, sumCols.tail: _*)
      .select(col(idCol),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("htable"), bucketOf(t).as("bucket"))): _*)).as("tb"))
      .select(col(idCol), col("tb.htable").as("htable"), col("tb.bucket").as("bucket"))
  }

  /** Single-table LSH bucket assignment (tables = 1 special case). */
  def lshAssign(df: DataFrame, idCol: String, vecCol: String,
                planes: Int): DataFrame =
    lshAssignTables(df, idCol, vecCol, tables = 1, bits = planes)
      .select(col(idCol), col("bucket"))

  /** ANN via multi-table LSH: exact cosine among candidates colliding
    * with the probe in ANY of the `tables` hash tables. Only 8-byte ids
    * flow through the bucket join; the (probe, candidate) pair set is
    * deduplicated across tables BEFORE vectors are fetched, so each
    * surviving pair is scored exactly once and the wide embedding rows
    * never replicate per table. Recall < 1 by design — tables (up) and
    * bits (down) are the recall knobs, candidate count the cost.
    */
  def lshTopK(candidates: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, k: Int,
              tables: Int = 16, bits: Int = 6): DataFrame = {
    val ca = lshAssignTables(candidates, idCol, vecCol, tables, bits)
    val pa = lshAssignTables(probes, "probe_id", "probe_vec", tables, bits)
    val pairIds = ca
      .join(broadcast(pa), Seq("htable", "bucket"))
      .filter(col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col(idCol)).distinct()
    val scored = pairIds
      .join(candidates.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(probes), Seq("probe_id"))
      .withColumn("score", round(cosine_sim(col("probe_vec"), col(vecCol)), 6))
    rankTopK(scored, idCol, k)
  }

  /** Per-partition mean vectors (the IVF "centroids"). Explode to
    * (partition, dim, value), average, reassemble — one narrow shuffle
    * of N·D scalar rows, run once per index build.
    */
  def centroids(df: DataFrame, partCol: String, vecCol: String): DataFrame =
    df.select(col(partCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(partCol), col("dim"))
      .agg(avg(col("v")).as("cv"))
      .groupBy(col(partCol))
      .agg(array_sort(collect_list(struct(col("dim"), col("cv")))).as("pairs"))
      .select(col(partCol), transform(col("pairs"), p => p.getField("cv")).as("centroid"))

  /** Per-label centroid COMPONENTS as flat (label, dim, n, centroid)
    * rows — the cross-engine-deterministic rendition of [[centroids]]:
    * components are rounded to 6 decimals and summed as DECIMAL(18,6)
    * (round-then-cast recovers the identical exact decimal in any
    * engine, so the sum is associative and partial-agg order can never
    * flip bits). One hash aggregation keyed on (label, dim): map-side
    * partials, K·D partial rows through the shuffle, no vector collect.
    */
  def labelCentroidComponents(df: DataFrame, labelCol: String,
                              vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(labelCol), col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("v").cast(DoubleType), 6).cast("decimal(18,6)")).as("__s"))
      // round(sum/n, 6) on the DOUBLE quotient is NOT cross-engine safe:
      // exact rationals like sum/n land on 6-decimal half boundaries,
      // where Java's shortest-repr HALF_UP and a C library's binary
      // rounding disagree (seen live at sf0.1). Round in exact integer
      // micro-units instead — half-away on positives via (2a+n) div 2n,
      // sign split off — then the final /1e6 is one exact IEEE divide.
      .withColumn("__si", (col("__s") * 1000000).cast("long"))
      .withColumn("__q",
        expr("(2 * abs(__si) + n) div (2 * n)")
          * when(col("__s") < 0, -1L).otherwise(1L))
      .select(col(labelCol), col("dim"), col("n"),
        (col("__q").cast(DoubleType) / lit(1000000.0)).as("centroid"))

  /** Per-label centroid components in exact integer MICRO units —
    * [[labelCentroidComponents]] stopped one step earlier: (label, dim,
    * cm) where cm = round(mean·10⁶) computed entirely in exact decimal /
    * integer arithmetic. The integer rendition exists so downstream
    * distance math (nearest-centroid classification) can stay in BIGINT,
    * where cross-engine equality is exact rather than probabilistic.
    */
  def labelCentroidMicros(df: DataFrame, labelCol: String,
                          vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(labelCol), col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("v").cast(DoubleType), 6).cast("decimal(18,6)")).as("__s"))
      .withColumn("__si", (col("__s") * 1000000).cast("long"))
      .select(col(labelCol), col("dim"),
        (expr("(2 * abs(__si) + n) div (2 * n)")
          * when(col("__s") < 0, -1L).otherwise(1L)).as("cm"))

  /** Nearest-centroid classification: assign every vector to the label
    * whose centroid is closest in squared L2 over micro-quantized
    * components — the cheap corpus-labeling / cluster-quality move
    * (given per-class centroids, which class does each point actually
    * sit in?).
    *
    * Determinism contract: points quantize to integer micros
    * (round(v·10⁶) — organic doubles never sit on the .5 boundary),
    * centroids come from [[labelCentroidMicros]]'s exact decimal path,
    * and d² = Σ(xᵢ−cᵢ)² stays in BIGINT throughout — bit-exact in any
    * engine, no float accumulation order anywhere. Ties break toward
    * the lower label via lexicographic struct min.
    *
    * Scale shape: the model is labels·dims integers — parameters, not
    * data — so the fit is ONE narrow (label, dim)-keyed aggregation and
    * a bounded driver collect (the kmeansFit contract), and scoring is
    * pure map work against the literal model: no join, no shuffle, no
    * per-row window.
    */
  def classifyByCentroid(df: DataFrame, idCol: String, labelCol: String,
                         vecCol: String): DataFrame = {
    val cents: Seq[(Int, Seq[Long])] =
      labelCentroidMicros(df, labelCol, vecCol)
        .groupBy(col(labelCol))
        .agg(array_sort(collect_list(struct(col("dim"), col("cm")))).as("pairs"))
        .select(col(labelCol).cast(IntegerType),
          expr("transform(pairs, p -> p.cm)"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).sortBy(_._1).toSeq
    val modelType = "array<struct<lab:int,cm:array<bigint>>>"
    // the whole model ships as ONE Literal (struct cast renames the
    // tuple fields positionally): an array(struct(lit...), ...) spelling
    // is labels·(dims+1) expression nodes for the analyzer/codegen to
    // chew per query — measurably slower at bench scale
    val model: Column =
      if (cents.isEmpty) array().cast(modelType)
      else typedlit(cents).cast(modelType)
    // scoring is ONE codegen expression (quantize + K·D argmin loop in
    // primitive longs) — the equivalent HOF spelling
    // (array_min(transform(model, c -> struct(aggregate(zip_with(…))))))
    // is CodegenFallback and was the whole 1.2 s scoring constant at
    // bench sf (adjudicated r12: ~600 µs/row interpreted vs one fused
    // loop here)
    df.select(col(idCol), col(labelCol),
        graft.functions.VectorExpressions
          .nearest_centroid_micros(col(vecCol), model).as("__best"))
      .select(col(idCol), col(labelCol),
        col("__best.lab").as("pred_label"),
        col("__best.d2").as("d2"),
        (col(labelCol) === col("__best.lab")).as("correct"))
  }

  /** Symmetric int8 quantization of a vector column — the standard
    * embedding-compression move (4× smaller than float32, dot products
    * stay sign-correct): struct(scale, q) with
    * scale = max(|v|)/127 (guarded against the zero vector) and
    * q_i = clamp(floor(v_i/scale + 0.5), ±127). floor-based rounding
    * deliberately: it is pure IEEE double arithmetic, bit-identical in
    * any engine, with no round-half ambiguity. The per-vector scale and
    * the quantized array are computed inside nested lambda bindings so
    * the max-abs pass runs once per vector, not once per element.
    */
  def int8Quantize(vec: Column): Column =
    element_at(transform(array(vec), e =>
      element_at(transform(
        array(greatest(
          array_max(transform(e, x => abs(x.cast(DoubleType)))),
          lit(1e-12)) / lit(127.0)),
        sc => struct(
          sc.as("scale"),
          transform(e, x => greatest(lit(-127.0),
            least(lit(127.0), floor(x.cast(DoubleType) / sc + lit(0.5)))))
            .as("q"))), 1)), 1)

  /** Top-k search over int8-QUANTIZED vectors: the compression move
    * composed with search. Cosine is scale-free, so the per-vector
    * quantization scale cancels and the integer-valued arrays rank
    * directly through the same codegen'd cosine + TopKAggregator path
    * as the float baseline — 4× less data scanned and broadcast, at
    * the cost of ≤ 0.5/127 per-element representation error. Quality
    * is contract-checked via [[recallAtK]] against the float exact
    * top-k, like every other approximate path here.
    */
  def quantizedTopK(candidates: DataFrame, idCol: String, vecCol: String,
                    probes: DataFrame, k: Int): DataFrame = {
    def q8(v: Column): Column =
      transform(int8Quantize(v).getField("q"), x => x.cast(FloatType))
    val qc = candidates.select(col(idCol), q8(col(vecCol)).as("cq"))
    val qp = probes.select(col("probe_id"), q8(col("probe_vec")).as("pq"))
    val scored = qc.join(broadcast(qp), col(idCol) =!= col("probe_id"))
      .withColumn("score", round(cosine_sim(col("pq"), col("cq")), 6))
    rankTopK(scored, idCol, k)
  }

  /** Centroid model as a literal array<struct<cid,cv>> column: the model
    * is K·D floats — parameters, not data — so it rides into codegen as
    * a constant instead of through a join. cv is array<float> to feed
    * the codegen'd cosine_sim directly.
    */
  private def centroidLit(cents: Seq[Array[Double]]): Column =
    if (cents.isEmpty)
      // a bare array() is untyped and fails analysis inside the fold
      // lambda (getField on an untyped lambda var); an empty CORPUS
      // (cold start, filtered-out partition) must yield an empty typed
      // model and empty results, not an AnalysisException
      array().cast("array<struct<cid:int,cv:array<float>>>")
    else array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), typedlit(c.map(_.toFloat).toSeq).as("cv"))
    }: _*)

  /** Nearest-centroid id for a vector column, computed MAP-SIDE
    * against the literal model — no join, no shuffle. Ties break
    * toward the earlier cell (strict >); a vector no cell can score
    * (NULL element, empty model) gets the seed cid -1. Runs as the
    * fused [[graft.functions.VectorExpressions.NearestCosineCell]]
    * primitive loop: the HOF spelling (`aggregate(model, seed,
    * (acc, ce) -> if cosine > acc.score …)`) is CodegenFallback and
    * its interpreted 16-cell × 64-dim fold per row dominated every
    * Lloyd iteration of [[kmeansFit]] (equivalence incl. tie/NULL/
    * zero-norm edges spec-pinned in FunctionsSpec).
    */
  def nearestCentroid(vec: Column, cents: Seq[Array[Double]]): Column =
    coalesce(
      graft.functions.VectorExpressions.nearest_cosine_cell(
        vec, centroidLit(cents)),
      lit(-1))

  /** The HOF rendition of [[nearestCentroid]] — kept as the executable
    * semantics reference the codegen expression is pinned against.
    */
  private[graft] def nearestCentroidHof(vec: Column,
                                        cents: Seq[Array[Double]]): Column = {
    // both `when` branches are cast to one explicit struct type: inside a
    // lambda, struct(...as("score")) loses the alias (field name col2) and
    // nullability differs from the literal seed, which fails analysis with
    // DATATYPE_MISMATCH.DATA_DIFF_TYPES
    val accType = "struct<cid:int,score:double>"
    aggregate(centroidLit(cents),
      struct(lit(-1).as("cid"), lit(-2.0).as("score")).cast(accType),
      (acc, ce) => {
        val s = cosine_sim(vec, ce.getField("cv"))
        when(s > acc.getField("score"),
          struct(ce.getField("cid"), s).cast(accType)).otherwise(acc)
      }).getField("cid")
  }

  /** The `nProbe` nearest centroid ids for a vector column, as an
    * array — the multi-probe variant of [[nearestCentroid]], same
    * map-side shape (score the literal model, sort the (score, cid)
    * structs, slice). Ties order by the struct sort (score, then cid).
    */
  def nearestCells(vec: Column, cents: Seq[Array[Double]], nProbe: Int): Column = {
    val scored = transform(centroidLit(cents), ce => struct(
      cosine_sim(vec, ce.getField("cv")).as("score"),
      ce.getField("cid").as("cid")))
    transform(slice(reverse(array_sort(scored)), 1, nProbe),
      x => x.getField("cid"))
  }

  /** Deterministic spherical k-means fit (Lloyd's): seeds are the k
    * lowest-id vectors, assignment is the map-side [[nearestCentroid]]
    * fold, per-dim means run as exact DECIMAL sums (partial-aggregation
    * order can never perturb a centroid), centroids re-normalized each
    * round. The model (k·dim doubles) lives on the driver like any
    * fitted-parameter object; each iteration is one narrow scan+agg job
    * over `df` — at 100 TB fit on a sample (`df.limit(n)` / id-range
    * filter), then assign the full corpus with the returned model.
    */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int = 5): Seq[Array[Double]] = {
    def norm(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    var cents: Seq[Array[Double]] = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(r => norm(r.getSeq[Double](0).toArray)).toSeq
    for (_ <- 0 until iters) {
      val means = df
        .select(nearestCentroid(col(vecCol), cents).as("cid"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg((sum(col("x").cast(DecimalType(28, 10))) / count(lit(1)))
          .cast(DoubleType).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
        .select(col("cid"), transform(col("pairs"), p => p.getField("m")).as("cv"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // an emptied cluster keeps its previous centroid
      cents = cents.indices.map(i => means.get(i).map(norm).getOrElse(cents(i)))
    }
    cents
  }

  /** Driver-side twin of [[kmeansFit]] for BOUNDED samples: one
    * collect of the (already limited) sample, then Lloyd's runs as a
    * local loop. The distributed fit pays per iteration one fresh
    * plan+codegen (the centroid literal changes every round) plus two
    * shuffles and a collect — ~1 s of fixed overhead per iteration at
    * any scale factor, which dominates when the sample is a few
    * thousand rows. Same geometry as [[kmeansFit]]: seeds are the k
    * lowest-id vectors normalized, assignment is first-wins
    * strictly-greater cosine (the [[nearestCentroid]] contract, NaN
    * scores never win), per-dim member means are renormalized each
    * round, an emptied cluster keeps its previous centroid, NULL
    * vectors contribute nothing (the distributed means' posexplode
    * drops them). Caller contract: `sample` must be driver-bounded
    * (e.g. `df.orderBy(id).limit(n)`) — this is a model fit, the same
    * bounded-collect class as [[kmeansFit]]'s own seed/centroid
    * collects.
    */
  def kmeansFitLocal(sample: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int = 5): Seq[Array[Double]] = {
    def norm(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val vecs: Array[Array[Double]] = sample
      .filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol))
      .collect().map(_.getSeq[Double](1).toArray)
    var cents: Seq[Array[Double]] = vecs.take(k).map(norm).toSeq
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.size)(null: Array[Double])
      val counts = new Array[Long](cents.size)
      vecs.foreach { v =>
        var vn = 0.0
        var i = 0
        while (i < v.length) { vn += v(i) * v(i); i += 1 }
        val vNorm = math.sqrt(vn)
        var best = -2.0
        var cid = -1
        var c = 0
        while (c < cents.size) {
          val cv = cents(c)
          if (cv.length == v.length) {
            var d = 0.0; var cn = 0.0; i = 0
            while (i < v.length) { d += v(i) * cv(i); cn += cv(i) * cv(i); i += 1 }
            val s = d / (vNorm * math.sqrt(cn))
            if (s > best) { best = s; cid = c } // NaN (zero norm) never wins
          }
          c += 1
        }
        if (cid >= 0) {
          if (sums(cid) == null) sums(cid) = new Array[Double](v.length)
          i = 0
          while (i < v.length) { sums(cid)(i) += v(i); i += 1 }
          counts(cid) += 1
        }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else norm(sums(c).map(_ / counts(c)))
      }
    }
    cents
  }

  /** IVF over k-means cells: fit K spherical centroids, assign every
    * candidate map-side, rank cells per probe against the literal model
    * (also map-side: score array → sort → top nProbe), exact-search only
    * the chosen cells. Unlike label-partition IVF this works when no
    * semantic partition column correlates with geometry — the cells ARE
    * geometric. Candidate traffic ≈ nProbe/K of the corpus per probe.
    */
  def kmeansIvfTopK(candidates: DataFrame, idCol: String, vecCol: String,
                    probes: DataFrame, k: Int,
                    kClusters: Int = 16, iters: Int = 5,
                    nProbe: Int = 4): DataFrame = {
    val cents = kmeansFit(candidates, idCol, vecCol, kClusters, iters)
    val assigned = candidates.select(col(idCol), col(vecCol),
      nearestCentroid(col(vecCol), cents).as("__cid"))
    // per-probe best cells: score all K against the literal model, sort
    // the (score, cid) structs, take the top nProbe — all map-side
    val scoredCells = transform(centroidLit(cents), ce => struct(
      cosine_sim(col("probe_vec"), ce.getField("cv")).as("score"),
      ce.getField("cid").as("cid")))
    val pc = probes.select(col("probe_id"), col("probe_vec"),
      explode(transform(slice(reverse(array_sort(scoredCells)), 1, nProbe),
        x => x.getField("cid"))).as("__cid"))
    val scored = assigned.join(broadcast(pc), Seq("__cid"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("score", round(cosine_sim(col("probe_vec"), col(vecCol)), 6))
    rankTopK(scored, idCol, k)
  }

  /** IVF search where the table LAYOUT is the index: the corpus was
    * written partitioned by its k-means cell id ([[nearestCentroid]]
    * under the same fitted model), so "search the best nProbe cells"
    * IS "scan nProbe partitions" — the per-probe cell choice is
    * map-side against the literal model, the (probe, cell) pairs
    * broadcast into the corpus scan's join, and a DSv2 source with
    * runtime partition filtering (the PartitionedSink catalog) drops
    * the un-probed cells' files before a byte is read. At 100 TB this
    * is vector search as partition pruning: cost scales with
    * nProbe/kClusters of the corpus, not the corpus.
    */
  def ivfLayoutTopK(corpus: DataFrame, idCol: String, vecCol: String,
                    cellCol: String, probes: DataFrame,
                    cents: Seq[Array[Double]], k: Int,
                    nProbe: Int = 4): DataFrame = {
    val pc = probes.select(col("probe_id"), col("probe_vec"),
      explode(nearestCells(col("probe_vec"), cents, nProbe)).as(cellCol))
    val scored = corpus.join(broadcast(pc), Seq(cellCol))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("score", round(cosine_sim(col("probe_vec"), col(vecCol)), 6))
    rankTopK(scored, idCol, k)
  }

  /** Recall@k of an ANN result against the exact top-k, as ONE summary
    * row (n_probes, recall_ok): mean recall = |ann ∩ exact| / (probes·k)
    * ≥ `minMeanRecall`. Probes the ANN missed entirely count as zero
    * hits. This is the oracle-checkable ANN contract — the exact side is
    * recomputable in any engine, and the boolean only passes if the ANN
    * genuinely clears the bound.
    */
  def recallAtK(ann: DataFrame, exact: DataFrame, k: Int,
                minMeanRecall: Double): DataFrame = {
    // Single pass over the exact side: the previous rendition embedded
    // the `exact` subtree TWICE in one plan (a semi-join for hits plus
    // a distinct for the probe denominator), so the expensive exact
    // brute-force top-k re-ran inside every recall check. One left
    // join against the (tiny, O(probes·k)) broadcast ANN pair set plus
    // one aggregate computes both: a distinct-probe count for the
    // denominator and a hit sum for the numerator. Values are
    // identical — the distinct() on the ANN side keeps semi-join
    // semantics even if an ANN variant ever emitted a duplicate pair,
    // and probes the ANN missed still count zero hits (they simply
    // never match).
    val annPairs = broadcast(
      ann.select(col("probe_id"), col("neighbor_id")).distinct()
        .withColumn("__hit", lit(1L)))
    exact.select(col("probe_id"), col("neighbor_id"))
      .join(annPairs, Seq("probe_id", "neighbor_id"), "left")
      .agg(
        count_distinct(col("probe_id")).as("n_probes"),
        (sum(coalesce(col("__hit"), lit(0L))).cast(DoubleType)
          / (count_distinct(col("probe_id")) * k) >= minMeanRecall)
          .as("recall_ok"))
  }

  /** IVF search: rank partitions by probe→centroid cosine, exact-search
    * the best nProbe partitions only.
    */
  def ivfTopK(candidates: DataFrame, idCol: String, vecCol: String, partCol: String,
              probes: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    val cents = centroids(candidates, partCol, vecCol)
    val wc = Window.partitionBy(col("probe_id"))
      .orderBy(col("cscore").desc, col(partCol))
    val chosen = broadcast(probes).join(broadcast(cents))
      .withColumn("cscore", round(cosine(col("probe_vec"), col("centroid")), 6))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nProbe)
      .select(col("probe_id"), col("probe_vec"), col(partCol))
    val scored = candidates.join(broadcast(chosen), Seq(partCol))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("score", round(cosine_sim(col("probe_vec"), col(vecCol)), 6))
    // Rank first (O(probes·k) shuffle), then recover the partition of each
    // winning neighbor with a broadcast join of the tiny result against a
    // two-column projection of the candidate set — cheaper than carrying
    // partCol through the aggregation buffer.
    val ranked = rankTopK(scored, idCol, k)
    candidates.select(col(idCol).cast("long").as("neighbor_id"),
        col(partCol).as("from_partition"))
      .join(broadcast(ranked), Seq("neighbor_id"))
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        col("score"), col("from_partition"))
  }

  /** Deterministic ±1 sign matrix for a Johnson–Lindenstrauss random
    * projection (Achlioptas, "Database-friendly random projections",
    * PODS 2001 — the ±1 variant needs no floats to STORE and preserves
    * pairwise inner products in expectation). Seeded from a splitmix-
    * style integer mix of (row, col), so every executor, run and engine
    * derives the identical matrix from the (inDim, outDim, seed)
    * triple — nothing random at execution time, nothing to broadcast
    * beyond a plan literal of outDim×inDim bytes.
    */
  private[graft] def signMatrix(inDim: Int, outDim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(outDim, inDim) { (j, i) =>
      var z = seed + j.toLong * 0x9e3779b97f4a7c15L + i.toLong * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
    }

  /** Project `vecCol` (array<float>, length `inDim`) to `outDim`
    * signed-sum components: p_j = Σ_i s_ji·x_i. Pure map work — the
    * matrix rides the plan as a literal, each output component is one
    * codegen'd zip_with/aggregate fold, and no shuffle or state is
    * involved, so the operator scales embarrassingly at any corpus
    * size. Output is array<float>: the 4-byte components keep the
    * projected relation 4× narrower than the input for the downstream
    * scorer, which is the point of projecting at all.
    */
  def randomProject(vec: Column, inDim: Int, outDim: Int, seed: Long = 42L): Column = {
    val m = typedLit(signMatrix(inDim, outDim, seed).map(_.toSeq).toSeq)
    // null-in → null-out: without the guard a NULL vector would project
    // to an array OF nulls (each component's zip_with yields NULL),
    // which downstream scorers treat as a present-but-poisoned vector
    when(vec.isNull, lit(null).cast("array<float>"))
      .otherwise(transform(m, row =>
        aggregate(
          zip_with(row, vec, (s, x) => s * x.cast(DoubleType)),
          lit(0.0), (acc, v) => acc + v).cast(FloatType)))
  }

  /** ANN via random projection + exact rerank — the coarse-quantize/
    * refine pattern: rank ALL candidates cheaply in the projected
    * space (projDim ≪ inDim floats per comparison), keep the top
    * `overfetch` per probe, then score ONLY those in full dimension
    * and return the exact-reranked top k.
    *
    * Scale shape: the full-dim pass touches O(probes·overfetch) rows
    * instead of the corpus — the candidate relation is tiny by
    * construction, so it BROADCASTS back against the corpus for vector
    * fetch; both ranking steps are the O(probes·k) top-k aggregation.
    * Total full-width arithmetic drops from N·Q to Q·overfetch, with
    * one N·Q pass in the narrow projected space.
    */
  def randomProjectionTopK(candidates: DataFrame, idCol: String, vecCol: String,
                           probes: DataFrame, k: Int,
                           inDim: Int, projDim: Int = 32,
                           overfetch: Int = 100): DataFrame = {
    val proj = candidates.withColumn("__pvec",
      randomProject(col(vecCol), inDim, projDim))
    val probesProj = probes.select(col("probe_id"), col("probe_vec"),
      randomProject(col("probe_vec"), inDim, projDim).as("__ppvec"))
    val cand = bruteForceTopK(
      proj, idCol, "__pvec",
      probesProj.select(col("probe_id"), col("__ppvec").as("probe_vec")),
      overfetch)
      .select(col("probe_id"), col("neighbor_id"))
    val rescored = candidates
      .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(probesProj.select(col("probe_id"), col("probe_vec"))),
        Seq("probe_id"))
      .withColumn("score", round(cosine_sim(col("probe_vec"), col(vecCol)), 6))
    rankTopK(rescored.withColumnRenamed("neighbor_id", "__nid"), "__nid", k)
  }

  // -------------------------------------------------- product quantization

  /** One subspace codebook as a literal array<struct<cid,cv,half>>:
    * like [[centroidLit]] but carrying |c|²/2 so squared-L2 assignment
    * and the ADC norm term stay one fold, no recomputed norms. */
  private def codebookLit(book: Seq[Array[Double]]): Column =
    array(book.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), typedlit(c.map(_.toFloat).toSeq).as("cv"),
        lit(c.map(x => x * x).sum / 2.0).as("half"))
    }: _*)

  /** Squared-L2 nearest codeword id, map-side: argmin |x−c|² over the
    * literal codebook as argmax (x·c − |c|²/2) — true Lloyd's geometry,
    * NOT the spherical cosine of [[nearestCentroid]]: PQ codeword
    * magnitudes carry signal the ADC dot sum needs. Ties break toward
    * the lower cid (strict >). */
  private def nearestCodeword(vec: Column, book: Seq[Array[Double]]): Column = {
    val accType = "struct<cid:int,score:double>"
    aggregate(codebookLit(book),
      struct(lit(-1).as("cid"), lit(Double.MinValue).as("score")).cast(accType),
      (acc, ce) => {
        val s = dot(vec, ce.getField("cv")) - ce.getField("half")
        when(s > acc.getField("score"),
          struct(ce.getField("cid"), s).cast(accType)).otherwise(acc)
      }).getField("cid")
  }

  /** Product-quantization fit (Jégou, Douze & Schmid, TPAMI 2011):
    * split the vector into `m` contiguous subspaces and run plain-L2
    * Lloyd's independently in each — but all `m` sub-fits share ONE
    * scan-and-aggregate job per iteration (assignment codes for every
    * subspace are computed in the same projection; per-(subspace,
    * codeword, dim) means come back from a single exact-DECIMAL
    * aggregation of m·kw·(dim/m) rows). Seeds are the kw lowest-id
    * vectors' slices; an emptied codeword keeps its previous value.
    * Like [[kmeansFit]], fit on a sample at 100 TB and encode the full
    * corpus with the returned model. */
  def pqFit(df0: DataFrame, idCol: String, vecCol: String,
            m: Int, kw: Int, iters: Int = 4): Seq[Seq[Array[Double]]] = {
    val df = df0.filter(col(vecCol).isNotNull)
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val seeds = df.orderBy(col(idCol)).limit(kw)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    var books: Seq[Seq[Array[Double]]] =
      (0 until m).map(j => seeds.toSeq.map(_.slice(j * sub, (j + 1) * sub)))
    for (_ <- 0 until iters) {
      val codeCols = (0 until m).map(j =>
        nearestCodeword(slice(col(vecCol), j * sub + 1, sub), books(j)).as(s"__c$j"))
      val means = df.select((col(vecCol) +: codeCols): _*)
        .select(array((0 until m).map(j => col(s"__c$j")): _*).as("cids"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
        .select(floor(col("d") / sub).cast(IntegerType).as("j"),
          (col("d") % sub).cast(IntegerType).as("ld"),
          element_at(col("cids"), floor(col("d") / sub).cast(IntegerType) + 1).as("cid"),
          col("x"))
        .groupBy(col("j"), col("cid"), col("ld"))
        .agg((sum(col("x").cast(DecimalType(28, 10))) / count(lit(1)))
          .cast(DoubleType).as("mn"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
      books = (0 until m).map { j =>
        books(j).zipWithIndex.map { case (old, c) =>
          (0 until sub).map(ld => means.getOrElse((j, c, ld), old(ld))).toArray
        }
      }
    }
    books
  }

  /** An empty (probe_id, rank, neighbor_id, score) result — the
    * cold-start/filtered-out-corpus shape every top-k entry point
    * returns instead of throwing on an empty or all-NULL vector
    * relation. */
  private def emptyTopK(like: DataFrame): DataFrame = {
    val spark = like.sparkSession
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("probe_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank", IntegerType),
        org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score", DoubleType))))
  }

  /** The ADC approximate cosine of a (__codes, probe_vec) row: fold
    * the m codes over the literal codebooks — Σⱼ probeⱼ·cⱼ /
    * √(Σⱼ|cⱼ|²), rounded to 6dp like every scorer here. Probe norm is
    * constant per probe and cannot change that probe's ranking. */
  private def adcCosine(books: Seq[Seq[Array[Double]]], sub: Int): Column = {
    val m = books.size
    val cw = (j: Int) => element_at(codebookLit(books(j)),
      col("__codes").getItem(j) + 1)
    val adc = (0 until m).map(j =>
      dot(slice(col("probe_vec"), j * sub + 1, sub), cw(j).getField("cv")))
      .reduce(_ + _)
    val sqNorm = (0 until m).map(j => cw(j).getField("half") * lit(2.0))
      .reduce(_ + _)
    round(adc / sqrt(greatest(sqNorm, lit(1e-12))), 6)
  }

  /** Top-k search over PQ-ENCODED vectors with asymmetric distance
    * computation: candidates carry only (id, m byte-sized codes) — the
    * corpus relation shrinks ~dim·4/m× (64-dim float → 8 codes is 32×)
    * — while each probe stays float and scores a candidate by folding
    * its codes over the m literal codebooks: cos ≈ Σⱼ probeⱼ·cⱼ /
    * √(Σⱼ|cⱼ|²) (probe norm is constant per probe and cannot change
    * that probe's ranking). This is the flat-scan compression tier;
    * compose the same codes with [[kmeansIvfTopK]] cells for IVFPQ.
    * Quality is contract-checked via [[recallAtK]] like every other
    * approximate path here. */
  def pqTopK(candidates0: DataFrame, idCol: String, vecCol: String,
             probes: DataFrame, k: Int, m: Int = 8, kw: Int = 16,
             iters: Int = 4, shortlist: Int = 0): DataFrame = {
    // persisted: the fit iterations, the dim probe, the encode pass
    // and the rerank's (id, vec) projection all rescan this relation
    val candidates = graft.ops.Caching.cachedOnce(
      candidates0.filter(col(vecCol).isNotNull))
    val dimRow = candidates.select(size(col(vecCol))).take(1)
    if (dimRow.isEmpty) return emptyTopK(candidates0)
    val dim = dimRow(0).getInt(0)
    val sub = dim / m
    val books = pqFit(candidates, idCol, vecCol, m, kw, iters)
    val codes = candidates.select(col(idCol),
      array((0 until m).map(j =>
        nearestCodeword(slice(col(vecCol), j * sub + 1, sub), books(j))): _*)
        .as("__codes"))
    val scored = codes.join(broadcast(probes), col(idCol) =!= col("probe_id"))
      .withColumn("score", adcCosine(books, sub))
    if (shortlist <= 0) rankTopK(scored, idCol, k)
    else rerankShortlist(candidates, idCol, vecCol, probes, scored, k, shortlist)
  }

  /** Exact re-rank of an approximate shortlist — the standard serving
    * shape for every compressed scan here: the approximate relation
    * absorbs the corpus-sized work, and only O(probes·shortlist) float
    * vectors are ever re-touched, via a broadcast of the tiny
    * shortlist against an (id, vec) projection. Recall is then bounded
    * by shortlist containment, not raw score distortion. */
  private def rerankShortlist(candidates: DataFrame, idCol: String,
                              vecCol: String, probes: DataFrame,
                              scored: DataFrame, k: Int,
                              shortlist: Int): DataFrame = {
    val cand = rankTopK(scored, idCol, shortlist)
      .select(col("probe_id").as("__pid"), col("neighbor_id"))
    val rescored = candidates
      .select(col(idCol).cast("long").as("neighbor_id"), col(vecCol))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(probes), col("__pid") === col("probe_id"))
      .withColumn("score", round(cosine_sim(col("probe_vec"), col(vecCol)), 6))
    rankTopK(rescored.withColumnRenamed("neighbor_id", "__nid"), "__nid", k)
  }

  /** Encode vectors against an already-fitted PQ model: (id, m codes),
    * all map-side — the separation that lets one fitted model encode a
    * stream of arriving batches (see EventsStreaming's ANN-index
    * maintenance sink) or a 100 TB corpus the model was fit on a
    * sample of. NULL vectors are dropped (they have no codes). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               books: Seq[Seq[Array[Double]]]): DataFrame = {
    val sub = books.head.head.length
    df.filter(col(vecCol).isNotNull).select(col(idCol),
      array(books.indices.map(j =>
        nearestCodeword(slice(col(vecCol), j * sub + 1, sub), books(j))): _*)
        .as("__codes"))
  }

  /** Top-k over an ALREADY-ENCODED index relation (id, __codes): ADC
    * against the literal codebooks, optionally exact-reranked against
    * a supplied float vector store. Unlike [[pqTopK]] this does not
    * exclude probe==candidate — serving an index answers "nearest
    * stored items", and a stored probe finding itself at rank 1 is the
    * correct answer. */
  def pqSearchEncoded(index: DataFrame, idCol: String, probes: DataFrame,
                      books: Seq[Seq[Array[Double]]], k: Int,
                      rerank: Option[(DataFrame, String)] = None,
                      shortlist: Int = 150): DataFrame = {
    val sub = books.head.head.length
    val scored = index.crossJoin(broadcast(probes))
      .withColumn("score", adcCosine(books, sub))
    rerank match {
      case None => rankTopK(scored, idCol, k)
      case Some((vectors, vecCol)) =>
        rerankShortlist(vectors, idCol, vecCol, probes, scored, k, shortlist)
    }
  }

  /** Persist a PQ model as (j, cid, cv) rows — m·kw rows of fitted
    * parameters, the driver-bounded model-object discipline. The write
    * is atomic at the directory level (_SUCCESS), so a crashed fit
    * never leaves a readable half-model. */
  def savePqModel(spark: org.apache.spark.sql.SparkSession, path: String,
                  books: Seq[Seq[Array[Double]]]): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cv, cid) => (j, cid, cv.toSeq) }
    }.toDF("j", "cid", "cv").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a PQ model written by [[savePqModel]]. */
  def loadPqModel(spark: org.apache.spark.sql.SparkSession,
                  path: String): Seq[Seq[Array[Double]]] =
    spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toSeq }

  /** IVFPQ (Jégou et al. 2011, §V): the k-means cells of
    * [[kmeansIvfTopK]] composed with the PQ codes of [[pqTopK]] — the
    * full production serving shape at 100 TB. The index relation is
    * (id, cell, m codes); a probe visits only its nProbe nearest
    * cells (≈ nProbe/kClusters of the corpus), scores those rows by
    * the ADC fold over the literal codebooks, and exact-rescoring
    * touches only the broadcast shortlist. Candidate traffic is
    * nProbe/K of the corpus per probe AND each visited row is ~m bytes
    * — the two reductions multiply.
    */
  def ivfPqTopK(candidates0: DataFrame, idCol: String, vecCol: String,
                probes: DataFrame, k: Int,
                kClusters: Int = 16, nProbe: Int = 6,
                m: Int = 16, kw: Int = 32, iters: Int = 4,
                shortlist: Int = 150): DataFrame = {
    // persisted: BOTH model fits iterate over this relation, plus the
    // dim probe, the index projection and the exact rerank
    val candidates = graft.ops.Caching.cachedOnce(
      candidates0.filter(col(vecCol).isNotNull))
    val dimRow = candidates.select(size(col(vecCol))).take(1)
    if (dimRow.isEmpty) return emptyTopK(candidates0)
    val dim = dimRow(0).getInt(0)
    val sub = dim / m
    val cents = kmeansFit(candidates, idCol, vecCol, kClusters, iters)
    val books = pqFit(candidates, idCol, vecCol, m, kw, iters)
    val index = candidates.select(col(idCol),
      nearestCentroid(col(vecCol), cents).as("__cid"),
      array((0 until m).map(j =>
        nearestCodeword(slice(col(vecCol), j * sub + 1, sub), books(j))): _*)
        .as("__codes"))
    val probeCells = probes.select(col("probe_id"), col("probe_vec"),
      explode(nearestCells(col("probe_vec"), cents, nProbe)).as("__cid"))
    val scored = index.join(broadcast(probeCells), Seq("__cid"))
      .filter(col(idCol) =!= col("probe_id"))
      .withColumn("score", adcCosine(books, sub))
    rerankShortlist(candidates, idCol, vecCol, probes, scored, k, shortlist)
  }
}
