package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines.
  *
  * Three tiers, by cost and fuzziness:
  *   1. exact       — hash-groupBy on a normalized fingerprint. One
  *                    shuffle on a 16-byte key; the 100 TB workhorse.
  *   2. MinHash LSH — shingle → per-row signature → band buckets →
  *                    candidate pairs → exact-Jaccard verify. Signature
  *                    computation is a pure map stage; the only shuffle
  *                    is on (band, bucket) keys, and only colliding docs
  *                    ever meet. No all-pairs anywhere.
  *   3. SimHash     — one 64-bit fingerprint per doc; near-dup = small
  *                    Hamming distance, found via band-collision on
  *                    16-bit quarters (any quarter equal ⇒ candidate,
  *                    guaranteed to catch Hamming ≤ 3 and probabilistic
  *                    beyond).
  */
object Dedup {

  /** Exact dedup groups: one row per distinct normalized content with
    * the canonical (minimum) doc id and the copy count.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Exact word-shingle Jaccard between two shingle-array columns. */
  def shingleJaccard(a: Column, b: Column): Column =
    (size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType))

  /** MinHash signature: `n` permutation minima over the doc's hashed
    * k-shingles. Permutation i is xxhash64 re-keyed by i — cheap,
    * deterministic, and independent enough for banding. Pure per-row
    * compute (no shuffle, no state).
    */
  def minhashSignature(textCol: Column, k: Int, n: Int): Column = {
    val hashes = TextAnalysis.shingleHashes(textCol, k)
    transform(sequence(lit(0), lit(n - 1)),
      i => array_min(transform(hashes, h => xxhash64(i, h))))
  }

  /** MinHash-LSH candidate pairs verified by exact shingle Jaccard.
    *
    * bands × rowsPerBand = signature length. Two docs collide when all
    * `rowsPerBand` signature slots of some band agree. Collision prob
    * for true Jaccard s is 1-(1-s^r)^b — with 8×4 the S-curve crosses
    * ~0.55, so tau >= 0.6 keeps verification cheap and recall high.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                   tau: Double = 0.6): DataFrame = {
    val sigs = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.shingles(col(textCol), k).as("sh"),
      minhashSignature(col(textCol), k, bands * rowsPerBand).as("sig"))

    val banded = sigs.select(
      col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bucket"))

    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b") // collapse multi-band collisions
      .withColumn("jaccard", shingleJaccard(array_distinct(col("sh_a")), array_distinct(col("sh_b"))))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-token ±1 bit votes: for each of the 64 bit positions of the
    * token hash, +1 if the bit is set else -1. Bit positions are Scala-
    * level constants (the Column DSL can only shift by literals).
    */
  private def bitVotes(h: Column): Column =
    array((0 until 64).map(i =>
      when(shiftright(h, i).bitwiseAND(lit(1L)) =!= 0, lit(1)).otherwise(lit(-1))): _*)

  /** Adds a 64-bit SimHash fingerprint column: each token hash votes ±1
    * per bit position; the sign of each accumulated position is the
    * fingerprint bit. Pure per-row compute — no shuffle, no state. The
    * votes array is materialized as its own column so the 64 bit-
    * assembly terms read it instead of re-running the aggregation.
    */
  def withSimhash(docs: DataFrame, textCol: String, outCol: String): DataFrame = {
    val hashes = transform(TextAnalysis.tokens(lower(col(textCol))), w => xxhash64(w))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, bitVotes(h), (a, v) => a + v))
    val assembled = (0 until 64)
      .map(i => when(element_at(col("__votes"), i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    docs.withColumn("__votes", votes)
      .withColumn(outCol, assembled)
      .drop("__votes")
  }

  /** Near-dup pairs by SimHash: candidates collide on any 16-bit quarter
    * of the fingerprint (catches all pairs with Hamming ≤ 3), verified
    * by full Hamming distance ≤ maxHamming.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 6): DataFrame = {
    val fp = withSimhash(docs, textCol, "sh64").select(col(idCol).as("doc_id"), col("sh64"))
    val quarters = array((0 until 4).map(q =>
      struct(lit(q).as("q"),
        shiftright(col("sh64"), 16 * q).bitwiseAND(lit(0xFFFFL)).as("qv"))): _*)
    val banded = fp.select(col("doc_id"), col("sh64"), explode(quarters).as("bb"))
      .select(col("doc_id"), col("sh64"), col("bb.q"), col("bb.qv"))
    val l = banded.select(col("q"), col("qv"), col("doc_id").as("doc_a"), col("sh64").as("ha"))
    val r = banded.select(col("q"), col("qv"), col("doc_id").as("doc_b"), col("sh64").as("hb"))
    l.join(r, Seq("q", "qv"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
