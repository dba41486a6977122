package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}
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

  /** Deterministic ±1 pseudo-random hyperplane sign for (plane, dim):
    * parity of xxhash64 — reproducible everywhere, no stored model.
    */
  private def planeSign(plane: Int, dimIdx: Column): Column =
    when(pmod(xxhash64(lit(plane), dimIdx), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Hyperplane-LSH bucket assignment: bit p = sign of the dot product
    * with pseudo-random ±1 plane p. Computed as posexplode + per-plane
    * sums (whole-stage codegen, map-side partials). Sums run in exact
    * DECIMAL so aggregation order can never flip a near-zero sign bit —
    * bucket ids are fully deterministic.
    */
  def lshAssign(df: DataFrame, idCol: String, vecCol: String,
                planes: Int): DataFrame = {
    val exploded = df.select(col(idCol),
      posexplode(col(vecCol)).as(Seq("dim", "x")))
    val sumCols = (0 until planes).map(p =>
      sum(col("x").cast(DecimalType(28, 10)) * planeSign(p, col("dim")).cast(DecimalType(2, 0)))
        .as(s"__s$p"))
    val bucket = (0 until planes)
      .map(p => when(col(s"__s$p") > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    exploded.groupBy(col(idCol))
      .agg(sumCols.head, sumCols.tail: _*)
      .select(col(idCol), bucket.as("bucket"))
  }

  /** ANN via LSH buckets: exact cosine, but only among candidates in the
    * probe's bucket. Recall < 1 by design; bucket fan-out is the knob.
    */
  def lshTopK(candidates: DataFrame, idCol: String, vecCol: String,
              probes: DataFrame, k: Int, planes: Int = 16): DataFrame = {
    val cb = candidates.join(lshAssign(candidates, idCol, vecCol, planes), idCol)
    val pb = probes.join(
      lshAssign(probes, "probe_id", "probe_vec", planes), "probe_id")
    val scored = cb.join(broadcast(pb), Seq("bucket"))
      .filter(col(idCol) =!= col("probe_id"))
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
}
