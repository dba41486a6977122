package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Scratch profiler for hot-path stages (not part of the library API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val docs = Tables.documents(spark, d)
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("[prof] docs=" + docs.count())
    docs.select(avg(size(TextAnalysis.tokens(col("text")))).as("avg_tokens")).show()
    time("warm text scan")(docs.agg(sum(length(col("text")))).collect())
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.shingleHashes(col("text"), 3))).as("h"))
    time("shingle explode count")(sh.count())
    time("shingle explode count #2")(sh.count())
    time("sizes agg")(sh.groupBy(col("doc_id")).agg(count(lit(1))).count())
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("w"))
    time("token explode count")(toks.count())
    val sig = graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 32)
    time("minhash signatures")(sig.count())
    time("minhash signatures #2")(sig.count())
    val banded = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(7)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * 4 + 1, lit(4))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    time("banded")(banded.count())
    time("minhash pairs full")(graft.dedup.Dedup.minhashPairs(
      docs, "doc_id", "text").count())
    time("jaccard full")(graft.dedup.Dedup.jaccardPairsExact(
      docs, "doc_id", "text", 3, 0.3, _ % 10 === 0).count())
    time("jaccard full #2")(graft.dedup.Dedup.jaccardPairsExact(
      docs, "doc_id", "text", 3, 0.3, _ % 10 === 0).count())
    // the q_dedup_clusters composition, staged: capped all-pairs edge
    // build vs the CC contraction loop on top of it
    val capped = graft.dedup.Dedup.jaccardPairsExact(
      docs, "doc_id", "text", 3, 0.3, _ => lit(true), maxDf = Some(50L))
    time("capped all-pairs edges")(capped.count())
    time("dedupClusters on edges") {
      val (labels, rounds) = graft.dedup.Dedup.dedupClustersWithRounds(
        docs, "doc_id", capped)
      labels.count()
      println(s"[prof]   cc rounds=$rounds")
    }
    // same loop with AQE off: isolates AQE's per-stage re-planning
    // latency, which dominates iterative tiny-stage loops
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("dedupClusters, AQE off") {
      val (labels, rounds) = graft.dedup.Dedup.dedupClustersWithRounds(
        docs, "doc_id", capped)
      labels.count()
      println(s"[prof]   cc rounds=$rounds")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
