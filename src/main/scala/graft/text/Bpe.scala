package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed byte-pair-encoding merge learning (Sennrich, Haddow &
  * Birch, "Neural Machine Translation of Rare Words with Subword
  * Units", ACL 2016 — public literature): the tokenizer-training
  * counterpart to the token/BPE statistics queries. Words decompose to
  * character symbols; each round counts adjacent symbol pairs across
  * the corpus, merges the most frequent pair everywhere, and repeats —
  * the merge table IS the trained tokenizer.
  *
  * Scale shape — the two classic tricks, both load-bearing at 100 TB:
  *
  *   - the corpus collapses FIRST to its distinct-word frequency
  *     relation (Heaps-law bounded: vocabulary grows ~√corpus), so
  *     every BPE round works on the vocab relation, never the corpus;
  *     pair counts weight by word frequency, which is exactly
  *     equivalent to counting over the raw token stream;
  *   - each round is ONE codegen'd aggregation (map-side partial sums,
  *     a pair-count-sized exchange) + a driver-side argmax of ONE row
  *     (the fitted parameter of the round — bounded like any model
  *     object) + a map-side non-overlapping rewrite of the symbol
  *     arrays. State is persisted per round and the parent freed, the
  *     [[graft.dedup.Dedup.dedupClusters]] iterative-operator
  *     discipline; rounds are `nMerges` by construction, not
  *     data-dependent.
  *
  * Determinism: the argmax tie-break is total (count desc, left asc,
  * right asc), and the rewrite is the standard left-to-right
  * non-overlapping pass ("aaa" under (a,a) → ["aa", "a"]), so the
  * merge table is a pure function of the corpus.
  */
object Bpe {

  /** Character symbols of a word, no empties (split-on-"" artifacts). */
  private def charSyms(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** One left-to-right non-overlapping merge pass of (l, r) → l+r,
    * as a codegen-friendly fold with a one-symbol carry: merge when
    * (carry, next) is exactly the pair, else emit the carry.
    */
  private[text] def mergePass(syms: Column, l: String, r: String): Column = {
    val init = struct(
      array().cast("array<string>").as("acc"),
      lit(null).cast("string").as("carry"))
    aggregate(syms, init,
      (s, x) =>
        when(s.getField("carry").isNull,
          struct(s.getField("acc").as("acc"), x.as("carry")))
        .when(s.getField("carry") === lit(l) && x === lit(r),
          struct(concat(s.getField("acc"), array(lit(l + r))).as("acc"),
            lit(null).cast("string").as("carry")))
        .otherwise(
          struct(concat(s.getField("acc"), array(s.getField("carry"))).as("acc"),
            x.as("carry"))),
      s => when(s.getField("carry").isNull, s.getField("acc"))
        .otherwise(concat(s.getField("acc"), array(s.getField("carry")))))
  }

  /** Learn the top `nMerges` BPE merges over the lowercased whitespace
    * tokens of `textCol`. Returns (merge_rank, left, right,
    * pair_count) in learn order; stops early when no adjacent pair
    * remains (every word fused to one symbol).
    */
  def learnMerges(docs: DataFrame, textCol: String,
                  nMerges: Int): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 0, s"learnMerges: nMerges must be nonnegative: $nMerges")
    var vocab = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(charSyms(col("w")).as("syms"), col("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    try {
      var exhausted = false
      var rank = 0
      while (rank < nMerges && !exhausted) {
        val best = vocab
          .filter(size(col("syms")) >= 2)
          .select(col("n"), explode(expr(
            "transform(sequence(0, size(syms) - 2), " +
              "i -> struct(element_at(syms, i + 1) AS l, element_at(syms, i + 2) AS r))"))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("n")).as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += ((rank, l, r, c))
          val next = vocab.select(mergePass(col("syms"), l, r).as("syms"), col("n"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before freeing the parent
          vocab.unpersist()
          vocab = next
          rank += 1
        }
      }
    } finally vocab.unpersist()
    merges.toSeq
  }

  /** Apply a learned merge table to a symbol-array column, merges in
    * rank order — the encode side of the tokenizer (each merge is one
    * map-side fold; `merges` is a fitted model parameter).
    */
  def applyMerges(syms: Column, merges: Seq[(Int, String, String, Long)]): Column =
    merges.sortBy(_._1).foldLeft(syms) { case (s, (_, l, r, _)) => mergePass(s, l, r) }

  /** Segment the lowercased whitespace tokens of `textCol` with a
    * learned merge table: one row per (doc, token) with its subword
    * pieces. Pure map work — the merge table rides in the plan as
    * literals.
    */
  def segment(docs: DataFrame, idCol: String, textCol: String,
              merges: Seq[(Int, String, String, Long)]): DataFrame =
    docs.select(col(idCol),
        posexplode(TextAnalysis.tokens(lower(col(textCol)))).as(Seq("token_idx", "w")))
      .select(col(idCol), col("token_idx"), col("w"),
        applyMerges(charSyms(col("w")), merges).as("pieces"))
}
