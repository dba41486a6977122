package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.similarity.Similarity

/** Similarity search over the `embeddings` table. Brute-force cosine
  * top-k is the oracle-checked baseline; LSH and IVF are the scale
  * paths (rows-only checks — bucket membership is engine-hash-
  * dependent, but their scoring math is the same oracle-checked cosine).
  */
object SimilarityQueries {

  private def probes(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))

  /** L2 norms — validates the vector plumbing end-to-end vs DuckDB. */
  val qEmbeddingNorms = Q(
    "q_embedding_norms",
    (s, d) => Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(Similarity.l2Norm(col("embedding")), 6).as("l2_norm"))
      .orderBy(col("vec_id")),
    Some("""
      SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
             round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))), 6) AS l2_norm
      FROM embeddings ORDER BY vec_id"""))

  /** Brute-force cosine top-10 per probe (probe set: vec_id % 100 = 0). */
  val qKnnBrute = Q(
    "q_knn_brute",
    (s, d) => Similarity
      .bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding", probes(s, d), 10)
      .orderBy(col("probe_id"), col("rank")),
    Some("""
      WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
                 FROM embeddings WHERE vec_id % 100 = 0),
      scored AS (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               round(list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pv)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(p.pv, p.pv))), 6) AS score
        FROM embeddings e, p WHERE e.vec_id <> p.probe_id)
      SELECT probe_id, CAST(rn AS INTEGER) AS rank, neighbor_id, score FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, neighbor_id) AS rn
        FROM scored)
      WHERE rn <= 10 ORDER BY probe_id, rank"""),
    headline = true)

  /** ANN top-5 via 16-plane hyperplane LSH (rows-only: bucket ids are
    * xxhash64-derived).
    */
  val qAnnLsh = Q(
    "q_ann_lsh",
    (s, d) => Similarity
      .lshTopK(Tables.embeddings(s, d), "vec_id", "embedding", probes(s, d), 5, bits = 6)
      .orderBy(col("probe_id"), col("rank")),
    None)

  /** ANN top-10 via IVF over the `label` partitions, nProbe=2. */
  val qAnnIvf = Q(
    "q_ann_ivf",
    (s, d) => Similarity
      .ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding", "label", probes(s, d), 10)
      .orderBy(col("probe_id"), col("rank")),
    None)

  val all: Seq[Q] = Seq(qEmbeddingNorms, qKnnBrute, qAnnLsh, qAnnIvf)
}
