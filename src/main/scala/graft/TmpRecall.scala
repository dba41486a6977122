package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

// TEMPORARY measurement runner — deleted before commit.
object TmpRecall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, d)
      val p = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      def meanRecall(ann: org.apache.spark.sql.DataFrame, k: Int): Double = {
        val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", p, k)
        val hits = brute.select(col("probe_id"), col("neighbor_id"))
          .join(ann.select(col("probe_id"), col("neighbor_id")),
            Seq("probe_id", "neighbor_id"), "left_semi")
          .count()
        val np = brute.select(col("probe_id")).distinct().count()
        hits.toDouble / (np * k)
      }
      println(s"### $d nprobes=${p.count()}")
      println(s"lsh(16,6) k=5  recall=" + meanRecall(
        Similarity.lshTopK(emb, "vec_id", "embedding", p, 5, tables = 16, bits = 6), 5))
      println(s"ivf(label,nProbe=2) k=10 recall=" + meanRecall(
        Similarity.ivfTopK(emb, "vec_id", "embedding", "label", p, 10), 10))
      println(s"kmeansIvf(16,4) k=10 recall=" + meanRecall(
        Similarity.kmeansIvfTopK(emb, "vec_id", "embedding", p, 10), 10))
    }
    spark.stop()
  }
}
