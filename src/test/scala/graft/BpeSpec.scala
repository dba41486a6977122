package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

/** [[graft.text.Bpe]] — distributed BPE merge learning cross-checked
  * against an INDEPENDENT in-memory reference implementation (plain
  * Scala over collected tokens, no Spark, no shared code with the
  * operator). q_bpe_learn also carries an unrolled-CTE DuckDB oracle
  * (10 fixed rounds, delimited-string replace as the merge pass);
  * this equivalence gate is the stronger check on the loop itself.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: word-frequency map, exhaustive pair count per
    * round, argmax with the (count desc, left asc, right asc)
    * tie-break, left-to-right non-overlapping rewrite.
    */
  private def referenceBpe(tokens: Seq[String],
                           nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = tokens
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, n) => w.split("").filter(_.nonEmpty).toVector -> n }
    def mergeLR(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val res = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        res += ((rank, l, r, c))
        vocab = vocab.toSeq
          .map { case (syms, n) => mergeLR(syms, l, r) -> n }
          .groupMapReduce(_._1)(_._2)(_ + _)
        rank += 1
      }
    }
    res.toSeq
  }

  test("learnMerges equals the in-memory reference on the harness corpus") {
    val sf = "/root/testdata/sf0.001"
    val got = Bpe.learnMerges(Tables.documents(spark, sf), "text", nMerges = 10)
    val toks = Tables.documents(spark, sf)
      .select(explode(graft.text.TextAnalysis.tokens(lower(col("text")))).as("w"))
      .as[String].collect().toSeq
    assert(got == referenceBpe(toks, 10))
  }

  test("merge pass is left-to-right non-overlapping and tie-break is total") {
    // "aaa"×3: the COUNT phase sees both adjacent positions (classic
    // get_stats → (a,a) count 6), but the REWRITE is non-overlapping:
    // "aaa" → ["aa","a"], so round 2 merges (aa,a) — count 3, not 6
    val docs = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, "text", nMerges = 3)
    assert(got == Seq((0, "a", "a", 6L), (1, "aa", "a", 3L)))
    // exhaustion: every word fused to one symbol after 2 merges — the
    // third round finds no pair and the learner stops early
    assert(got.size == 2)
  }

  test("segment applies merges in rank order") {
    val docs = Seq((1L, "abab abx")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 2)
    // (a,b) count 3 first; then (ab,ab) vs (ab,x) — (ab,ab) count 1,
    // (ab,x) count 1, tie → left asc picks (ab,ab)
    assert(merges == Seq((0, "a", "b", 3L), (1, "ab", "ab", 1L)))
    val pieces = Bpe.segment(docs, "doc_id", "text", merges)
      .orderBy(col("token_idx"))
      .select(col("pieces")).as[Seq[String]].collect().toSeq
    assert(pieces == Seq(Seq("abab"), Seq("ab", "x")))
  }
}
