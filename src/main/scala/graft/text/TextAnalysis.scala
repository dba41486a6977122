package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, language-ID, quality scoring, document
  * fingerprinting.
  *
  * Everything here is a pure `Column => Column` expression builder —
  * per-row, shuffle-free, and fully parallel, which is the property that
  * matters at 100 TB: these run as a map stage fused into whatever scan
  * feeds them. No UDFs; higher-order array functions + regexp + hash
  * built-ins only, so Catalyst keeps pushdown and (for the non-HOF
  * parts) whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (leading/trailing runs). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(IntegerType)

  /** BPE-ish subword proxy count: runs of letters, single digits, or
    * single punctuation marks — the shape of a byte-pair tokenizer's
    * pre-tokenization, countable without a vocab file.
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))
      .cast(IntegerType)

  /** Distinct lowercase word set (basis for Jaccard / dedup). */
  def wordSet(text: Column): Column = array_distinct(tokens(lower(text)))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"))

  /** Stopword hits for one language. */
  def stopwordHits(text: Column, lang: String): Column =
    size(filter(tokens(lower(text)), w => w.isin(stopwords(lang): _*)))
      .cast(IntegerType)

  /** Heuristic language-ID: CJK codepoints ⇒ zh, else the language with
    * the most stopword hits (priority order en>de>es>fr on ties, 'und'
    * when nothing matches). Deterministic by construction.
    *
    * The token array is bound once as a lambda variable; writing the
    * four stopword counts directly against `tokens(...)` re-tokenizes
    * per reference (each count appears twice in the when-chain plus
    * once in greatest — ~8 tokenize passes per row).
    */
  def langId(text: Column): Column = {
    val result = transform(array(tokens(lower(text))), toks => {
      def hits(lang: String): Column =
        size(filter(toks, w => w.isin(stopwords(lang): _*)))
      val en = hits("en"); val de = hits("de")
      val es = hits("es"); val fr = hits("fr")
      val best = greatest(en, de, es, fr)
      when(best === 0, lit("und"))
        .when(en === best, lit("en"))
        .when(de === best, lit("de"))
        .when(es === best, lit("es"))
        .otherwise(lit("fr"))
    })
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .otherwise(element_at(result, 1))
  }

  /** Punctuation character count (explicit set — portable across regex
    * engines, unlike POSIX classes).
    */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:'\"()-]"), lit(0))).cast(IntegerType)

  /** Composite quality score in [0,1]: balanced length, low punctuation
    * density, healthy stopword ratio. Same double formula on the oracle
    * side, so results are bit-identical.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val nChars = length(text).cast(DoubleType)
    val punctRatio = punctCount(text).cast(DoubleType) / greatest(nChars, lit(1.0))
    val stopRatio = stopwordHits(text, "en").cast(DoubleType) / greatest(nTok, lit(1.0))
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    (lenScore * lit(0.5) + (lit(1.0) - punctRatio) * lit(0.25)
      + least(stopRatio * lit(4.0), lit(1.0)) * lit(0.25))
  }

  /** All curation metrics in ONE tokenize pass: struct(n_tokens,
    * quality, pred_lang). [[tokenCount]] + [[qualityScore]] + [[langId]]
    * written separately tokenize the document ~8× (each stopword count
    * and each formula term re-evaluates its own tokens()); binding the
    * lowercased token array once as a lambda variable computes the
    * identical values — bit-for-bit, same formulas — in a single pass.
    * The win is pure map-stage constant factor, which is exactly what
    * matters when the stage runs over 100 TB of text.
    */
  def docMetrics(text: Column): Column = {
    val metrics = transform(array(tokens(lower(text))), toks => {
      def hits(lang: String): Column =
        size(filter(toks, w => w.isin(stopwords(lang): _*)))
      val nTok = size(toks)
      val nTokD = nTok.cast(DoubleType)
      val nChars = length(text).cast(DoubleType)
      val punctRatio = punctCount(text).cast(DoubleType) / greatest(nChars, lit(1.0))
      val stopRatio = hits("en").cast(DoubleType) / greatest(nTokD, lit(1.0))
      val quality = least(nTokD / lit(64.0), lit(1.0)) * lit(0.5) +
        (lit(1.0) - punctRatio) * lit(0.25) +
        least(stopRatio * lit(4.0), lit(1.0)) * lit(0.25)
      val en = hits("en"); val de = hits("de")
      val es = hits("es"); val fr = hits("fr")
      val best = greatest(en, de, es, fr)
      val lang = when(best === 0, lit("und"))
        .when(en === best, lit("en"))
        .when(de === best, lit("de"))
        .when(es === best, lit("es"))
        .otherwise(lit("fr"))
      struct(nTok.cast(IntegerType).as("n_tokens"), quality.as("quality"),
        lang.as("pred_lang"))
    })
    val m = element_at(metrics, 1)
    // CJK probe operates on the raw text, outside the token binding
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"),
      m.withField("pred_lang", lit("zh"))).otherwise(m)
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text.
    * Stable across engines (md5 is md5 everywhere) — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** 64-bit rolling-hash-style fingerprint (xxhash64 of the normalized
    * text) — cheaper than md5 when only bucketing is needed. Engine-
    * specific hash ⇒ no SQL oracle; used by SimHash/MinHash paths.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Word k-shingles (k consecutive tokens joined by one space). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(lower(text))
    when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(k)),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  /** Hashed k-shingles WITHOUT materializing shingle strings: hash each
    * token once, then combine every k-window with xxhash64 over the k
    * token hashes (O(1) array lookups per window). Distinct shingles map
    * to distinct hashes w.h.p., which is the only property consumers
    * (MinHash banding, Jaccard counting) rely on — nothing depends on
    * these equalling xxhash64 of the joined string, and skipping the
    * per-window slice+join+rehash of strings is ~10× on the shingle hot
    * path. Short docs (< k tokens) contribute one shingle covering all
    * tokens, mirroring [[shingles]].
    */
  def shingleHashes(text: Column, k: Int): Column = {
    val th = transform(tokens(lower(text)), t => xxhash64(t))
    // Bind the token-hash array ONCE as a lambda variable: referencing
    // the raw `th` expression from inside the window lambda would
    // re-evaluate the whole tokenize+hash per element_at — O(n²·k) per
    // document. A lambda variable holds the materialized value.
    flatten(transform(array(th), ths => {
      def window(i: Column): Column =
        xxhash64((0 until k).map(j => element_at(ths, i + lit(j + 1))): _*)
      when(size(ths) < k,
        array(aggregate(ths, lit(42L), (acc, h) => xxhash64(acc, h))))
        .otherwise(transform(sequence(lit(0), size(ths) - lit(k)), window(_)))
    }))
  }
}
