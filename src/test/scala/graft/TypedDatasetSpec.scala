package graft

import org.apache.spark.sql.Dataset

/** Top-level (not nested in the spec class): Spark encoders cannot
  * instantiate inner classes — they need a no-outer-pointer constructor.
  */
case class DimDate(date_dim_id: Int, date_date: java.sql.Date,
                   year: Short, month: Byte, day: Byte,
                   week_of_year: Byte, day_of_week: Byte)

/** Typed shapes of the extension tables. */
case class Document(doc_id: Long, text: String, lang: String,
                    source: String, n_chars: Long)
case class EmbeddingRow(vec_id: Long, embedding: Array[Float], label: Int)

/** Typed Dataset[T] surface over the warehouse shapes (SURVEY §1 —
  * case-class Encoders where compile-time field checks pay off).
  */
class TypedDatasetSpec extends SparkSpec {
  import spark.implicits._

  test("dateDimension binds to a typed Dataset and supports typed ops") {
    val ds: Dataset[DimDate] =
      graft.ops.DateDim.dateDimension(spark, "2024-02-01", "2024-03-01").as[DimDate]
    val leap = ds.filter(_.date_dim_id == 20240229).collect()
    assert(leap.length == 1 && leap(0).month == 2 && leap(0).day == 29)
    val byMonth = ds.groupByKey(_.month).count().collect().toMap
    assert(byMonth == Map(2.toByte -> 29L, 3.toByte -> 1L))
  }

  test("documents and embeddings bind to typed Datasets; typed ops compose with Column ops") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").as[Document]
    // typed filter feeding an untyped curation op: the two APIs compose
    val en = docs.filter(_.lang == "en")
    val kept = graft.dedup.Dedup.exactGroups(en.toDF(), "doc_id", "text")
    assert(kept.count() > 0)
    assert(en.collect().forall(d => d.text.length.toLong == d.n_chars),
      "n_chars matches text length through the typed view")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").as[EmbeddingRow]
    val dims = emb.map(_.embedding.length).distinct().collect()
    assert(dims.toSeq == Seq(64), "all embeddings are 64-dim through the typed view")
  }

  test("typed map/filter keep the schema round-trippable") {
    val ds = graft.ops.DateDim.dateDimension(spark, "2024-01-01", "2024-01-07").as[DimDate]
    val mondays = ds.map(d => (d.date_dim_id, d.day_of_week))
      .filter(_._2 == 2) // Spark dayofweek: Sunday=1, Monday=2
      .collect()
    assert(mondays.map(_._1).toSeq == Seq(20240101))
  }
}
