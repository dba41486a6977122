package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries. The harness has no binary media table, so
  * document text bytes stand in as the opaque payload (`CAST(text AS
  * BINARY)`) — which keeps every byte-level operation oracle-checkable
  * in DuckDB while exercising the exact plumbing a real media table
  * would use.
  */
object MultimodalQueries {

  private def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"))

  /** Payload metadata: byte length + header bytes (magic-number probe). */
  val qMultimodalMeta = Q(
    "q_multimodal_meta",
    (s, d) => media(s, d)
      .select(
        col("media_id"),
        length(col("content")).as("n_bytes"),
        hex(substring(col("content"), 1, 4)).as("header_hex"))
      .orderBy(col("media_id")),
    Some("""
      SELECT doc_id AS media_id,
             CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
             hex(CAST(substring(text, 1, 4) AS BLOB)) AS header_hex
      FROM documents ORDER BY media_id"""))

  /** Fixed-stride frame sampling: one payload → up to 4 frame slices,
    * fingerprinted with md5 (md5 is md5 in every engine, so even the
    * frame *content* is oracle-checked).
    */
  val qMultimodalFrames = Q(
    "q_multimodal_frames",
    (s, d) => Multimodal
      .sampleFrames(media(s, d), "media_id", "content", nFrames = 4, frameSize = 16)
      .select(col("media_id"), col("frame_idx"), md5(col("frame")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx")),
    Some("""
      WITH m AS (SELECT doc_id AS media_id, text,
                        CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS nb
                 FROM documents),
      offs AS (
        SELECT media_id, text, nb,
               greatest(CAST(floor((nb - 16) / 3) AS INTEGER), 1) AS stride
        FROM m),
      frames AS (
        SELECT media_id, i AS frame_idx, i * stride + 1 AS off, text, nb
        FROM offs, (SELECT unnest(range(0, 4)) AS i)
        WHERE i * stride + 1 + 15 <= nb)
      SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             md5(substring(text, off, 16)) AS frame_md5
      FROM frames ORDER BY media_id, frame_idx"""))

  /** Stubbed decode + feature shape: byte-histogram "features" reduced
    * to a checksum so the fan-out/fan-in plumbing is verified without a
    * real codec. Oracle-checkable because the fake is pure byte math.
    */
  val qMultimodalDecode = Q(
    "q_multimodal_decode",
    (s, d) => {
      val decoded = Multimodal.decode(media(s, d))
      decoded.select(
        col("media_id"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        col("decoded.duration_ms").as("duration_ms"))
        .orderBy(col("media_id"))
    },
    Some("""
      SELECT doc_id AS media_id,
             CAST(64 + (ascii(substring(text, 1, 1)) % 64) * 16 AS INTEGER) AS width,
             CAST(64 + (ascii(substring(text, 2, 1)) % 64) * 16 AS INTEGER) AS height,
             CAST(octet_length(CAST(text AS BLOB)) * 10 AS INTEGER) AS duration_ms
      FROM documents ORDER BY media_id"""))

  /** Feature extraction (k=8 byte-histogram stub): the dense vector is
    * verified through its exact invariants — dimension, total mass
    * (= payload bytes) and bucket-weighted mass — all byte math DuckDB
    * reproduces from the text.
    */
  val qMultimodalFeatures = Q(
    "q_multimodal_features",
    (s, d) => Multimodal
      .extractFeatures(media(s, d), "media_id", "content", k = 8)
      .select(col("media_id"), posexplode(col("feature")).as(Seq("j", "v")))
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).cast(IntegerType).as("dim"),
        sum(col("v")).cast(IntegerType).as("f_total"),
        sum(col("j") * col("v")).cast("bigint").as("f_weighted"))
      .orderBy(col("media_id")),
    Some("""
      WITH chars AS (
        SELECT doc_id,
               unnest([ascii(substring(text, i, 1)) % 8
                       for i in range(1, octet_length(CAST(text AS BLOB)) + 1)]) AS b
        FROM documents)
      SELECT doc_id AS media_id, 8 AS dim,
             CAST(count(*) AS INTEGER) AS f_total,
             CAST(sum(b) AS BIGINT) AS f_weighted
      FROM chars GROUP BY doc_id ORDER BY media_id"""),
    headline = true)

  /** Stub resize (downsample to ≤64 bytes, every stride-th byte): both
    * the new length and the md5 of the resized CONTENT are
    * oracle-checked, so the byte selection itself is verified.
    */
  val qMultimodalResize = Q(
    "q_multimodal_resize",
    (s, d) => Multimodal
      .resize(media(s, d), "media_id", "content", targetBytes = 64)
      .select(col("media_id"),
        md5(col("resized")).as("resized_md5"),
        length(col("resized")).cast(IntegerType).as("resized_bytes"))
      .orderBy(col("media_id")),
    Some("""
      WITH m AS (SELECT doc_id, text,
                        CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS nb
                 FROM documents),
      r AS (SELECT doc_id,
                   CASE WHEN nb <= 64 THEN 1
                        ELSE CAST(ceil(nb / 64.0) AS INTEGER) END AS stride
            FROM m)
      SELECT m.doc_id AS media_id,
             md5(array_to_string(
               [substring(m.text, i, 1) for i in range(1, m.nb + 1)
                if (i - 1) % r.stride = 0], '')) AS resized_md5,
             CAST(len([i for i in range(1, m.nb + 1)
                       if (i - 1) % r.stride = 0]) AS INTEGER) AS resized_bytes
      FROM m JOIN r ON m.doc_id = r.doc_id ORDER BY media_id"""))

  /** Media near-dup: codec feature vectors fed UNCHANGED into the
    * embedding dedup tier ([[graft.dedup.Dedup.embeddingPairs]]) — the
    * cross-tier composition that makes the embedding operators
    * modality-agnostic (an image near-dup pipeline is decode →
    * features → the SAME pair/cluster/keep machinery as text
    * embeddings; at scale swap in `embeddingPairsLsh` exactly as the
    * text tier does). Stub features are k=8 byte histograms, so every
    * dot product is integer-exact and DuckDB recomputes the identical
    * rounded cosine from (doc, bucket, count) relations — no vector
    * type needed on the oracle side. tau 0.9999 isolates near-copies
    * (whitespace/case variants shift few byte buckets).
    *
    * The oracle iterates UTF-8 BYTES, not characters: DuckDB has no
    * blob indexing, so each byte is rebuilt from two hex digits of
    * `to_hex(encode(text))` — byte-exact for any input, where the
    * previous char-indexed `substring` silently matched only while the
    * fixture stayed pure ASCII.
    */
  val qMediaNeardup = Q(
    "q_media_neardup",
    (s, d) => graft.dedup.Dedup.embeddingPairs(
        Multimodal.extractFeatures(media(s, d), "media_id", "content", k = 8)
          .select(col("media_id"), col("feature")),
        "media_id", "feature", tau = 0.9999, probePred = _ % 10 === 0)
      .orderBy(col("id_a"), col("id_b")),
    Some("""
      WITH hx AS (
        SELECT doc_id, upper(to_hex(encode(text))) AS h FROM documents),
      chars AS (
        SELECT doc_id,
               unnest([((position(substring(h, 2*i - 1, 1) IN '0123456789ABCDEF') - 1) * 16
                        + position(substring(h, 2*i, 1) IN '0123456789ABCDEF') - 1) % 8
                       for i in range(1, length(h) // 2 + 1)]) AS b
        FROM hx),
      h AS (SELECT doc_id, b, count(*) AS n FROM chars GROUP BY 1, 2),
      nrm AS (SELECT doc_id, sum(n * n) AS nn FROM h GROUP BY 1),
      d AS (SELECT a.doc_id AS pa, b.doc_id AS pb, sum(a.n * b.n) AS dot
            FROM h a JOIN h b ON a.b = b.b AND a.doc_id <> b.doc_id
            WHERE a.doc_id % 10 = 0 GROUP BY 1, 2),
      c AS (SELECT DISTINCT least(pa, pb) AS id_a, greatest(pa, pb) AS id_b,
                   round(dot / (sqrt(x.nn) * sqrt(y.nn)), 6) AS score
            FROM d JOIN nrm x ON x.doc_id = pa JOIN nrm y ON y.doc_id = pb
            WHERE round(dot / (sqrt(x.nn) * sqrt(y.nn)), 6) >= 0.9999)
      SELECT id_a, id_b, score FROM c ORDER BY id_a, id_b"""))

  /** Perceptual difference-hash (dHash) per media payload — the
    * standard image near-dup fingerprint (8 "pixel rows" × 7
    * adjacent-brightness comparisons → 56-bit signature; robust to
    * uniform brightness/contrast shifts because only ORDER between
    * neighbors matters). The harness "pixels" are the payload's
    * leading codepoints (the byte-math stand-in this module uses
    * everywhere), so the hash is pure in-row arithmetic both engines
    * compute identically — with a real decoder the same expression
    * runs over the resized grayscale rows. Payloads shorter than the
    * 8×8 pixel grid are skipped on both engines.
    */
  val qMediaDhash = Q(
    "q_media_dhash",
    (s, d) => Tables.documents(s, d)
      .filter(length(col("text")) >= 64)
      .select(col("doc_id").as("media_id"),
        expr("""aggregate(sequence(0, 55), CAST(0 AS BIGINT), (a, k) ->
                  a + IF(ascii(substring(text, CAST((k div 7) * 8 + (k % 7) + 1 AS INT), 1))
                       < ascii(substring(text, CAST((k div 7) * 8 + (k % 7) + 2 AS INT), 1)),
                      shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)), CAST(0 AS BIGINT)))""")
          .as("dhash"))
      .orderBy(col("media_id")),
    Some("""
      SELECT doc_id AS media_id,
             CAST(list_sum(list_transform(range(0, 56), k ->
               CASE WHEN ascii(substring(text, CAST((k // 7) * 8 + (k % 7) + 1 AS INTEGER), 1))
                       < ascii(substring(text, CAST((k // 7) * 8 + (k % 7) + 2 AS INTEGER), 1))
                    THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END)) AS BIGINT) AS dhash
      FROM documents WHERE length(text) >= 64
      ORDER BY media_id"""))

  /** dHash near-dup pairs at Hamming ≤ 3 via 4×14-bit banding — the
    * SimHash banding discipline applied to the perceptual hash, but
    * with PROVABLY complete recall: ≤ 3 differing bits cannot touch
    * all 4 bands (pigeonhole), so every qualifying pair shares at
    * least one exact band and the banded join finds exactly the
    * brute-force pair set — which is what the oracle recomputes
    * all-pairs. Shuffle carries (band, value)-keyed ids only; the
    * exact Hamming verify runs on the collided candidates.
    */
  val qMediaDhashPairs = Q(
    "q_media_dhash_pairs",
    (s, d) => {
      val h = Tables.documents(s, d)
        .filter(length(col("text")) >= 64)
        .select(col("doc_id").as("media_id"),
          expr("""aggregate(sequence(0, 55), CAST(0 AS BIGINT), (a, k) ->
                    a + IF(ascii(substring(text, CAST((k div 7) * 8 + (k % 7) + 1 AS INT), 1))
                         < ascii(substring(text, CAST((k div 7) * 8 + (k % 7) + 2 AS INT), 1)),
                        shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)), CAST(0 AS BIGINT)))""")
            .as("dhash"))
      val banded = h.select(col("media_id"), col("dhash"),
        explode(expr(
          """transform(sequence(0, 3),
               b -> struct(b AS bi, (dhash div shiftleft(CAST(1 AS BIGINT), CAST(b * 14 AS INT))) % 16384 AS bv))"""))
          .as("bb"))
        .select(col("media_id"), col("dhash"), col("bb.bi").as("bi"), col("bb.bv").as("bv"))
      banded.as("a")
        .join(banded.as("b"),
          col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv")
            && col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
          col("a.dhash").as("ha"), col("b.dhash").as("hb"))
        .distinct()
        .select(col("id_a"), col("id_b"),
          expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""
      WITH h AS (
        SELECT doc_id AS media_id,
               CAST(list_sum(list_transform(range(0, 56), k ->
                 CASE WHEN ascii(substring(text, CAST((k // 7) * 8 + (k % 7) + 1 AS INTEGER), 1))
                         < ascii(substring(text, CAST((k // 7) * 8 + (k % 7) + 2 AS INTEGER), 1))
                      THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END)) AS BIGINT) AS dhash
        FROM documents WHERE length(text) >= 64)
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
      FROM h a JOIN h b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
      ORDER BY id_a, id_b"""))

  val all: Seq[Q] = Seq(qMultimodalMeta, qMultimodalFrames, qMultimodalDecode,
    qMultimodalFeatures, qMultimodalResize, qMediaNeardup, qMediaDhash,
    qMediaDhashPairs)
}
