package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Temporary measurement harness for ANN contract thresholds (deleted
  * before commit).
  */
object ScratchAnn {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = Tables.embeddings(spark, d)
    val p = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    def mean(ann: org.apache.spark.sql.DataFrame, k: Int): Unit = {
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", p, k)
      val hits = brute.select(col("probe_id"), col("neighbor_id"))
        .join(ann.select(col("probe_id"), col("neighbor_id")),
          Seq("probe_id", "neighbor_id"), "left_semi")
        .groupBy(col("probe_id")).agg(count(lit(1)).as("h"))
      brute.select(col("probe_id")).distinct()
        .join(hits, Seq("probe_id"), "left")
        .select(col("probe_id"), (coalesce(col("h"), lit(0L)) / k.toDouble).as("rec"))
        .orderBy(col("probe_id")).show(100, false)
    }
    for ((t, b) <- Seq((16, 6), (24, 6), (16, 4))) {
      println(s"=== LSH tables=$t bits=$b k=5")
      mean(Similarity.lshTopK(emb, "vec_id", "embedding", p, 5, tables = t, bits = b), 5)
    }
    for ((kc, np) <- Seq((16, 4), (16, 6), (8, 3))) {
      println(s"=== kmeans IVF K=$kc nProbe=$np k=10")
      mean(Similarity.kmeansIvfTopK(emb, "vec_id", "embedding", p, 10,
        kClusters = kc, nProbe = np), 10)
    }
    spark.stop()
  }
}
