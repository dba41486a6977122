package graft

import org.apache.spark.sql.functions._
import graft.functions.Bitmap._

/** [[graft.functions.Bitmap]] — exact dense-domain set algebra.
  * Reference results come from plain Scala Sets over the same ids.
  */
class BitmapSpec extends SparkSpec {
  import spark.implicits._

  private val idsA = Seq(1L, 5L, 9L, 5L, 123456L, 9L, 0L)
  private val idsB = Seq(5L, 7L, 123456L, 2L)

  test("bitmap set algebra matches reference Sets exactly") {
    val a = idsA.toDF("id").repartition(3)
      .agg(idset_agg(col("id")).as("bm"))
    val b = idsB.toDF("id").repartition(2)
      .agg(idset_agg(col("id")).as("bm"))
    val row = a.crossJoin(b.withColumnRenamed("bm", "bm2"))
      .select(
        idset_count(col("bm")).as("na"),
        idset_count(col("bm2")).as("nb"),
        idset_count(idset_and(col("bm"), col("bm2"))).as("nBoth"),
        idset_count(idset_andnot(col("bm"), col("bm2"))).as("nOnlyA"))
      .collect()(0)
    val (sa, sb) = (idsA.toSet, idsB.toSet)
    assert(row.getLong(0) == sa.size)
    assert(row.getLong(1) == sb.size)
    assert(row.getLong(2) == (sa intersect sb).size)
    assert(row.getLong(3) == (sa diff sb).size)
  }

  test("wire format is partitioning-invariant and merge equals one-shot") {
    def bytesOf(parts: Int): Array[Byte] =
      idsA.toDF("id").repartition(parts)
        .agg(idset_agg(col("id"))).collect()(0).getAs[Array[Byte]](0)
    assert(bytesOf(1).toSeq == bytesOf(4).toSeq)
    // per-partition bitmaps re-merged == one-shot bitmap
    val perPart = idsA.toDF("id").repartition(3)
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(idset_agg(col("id")).as("bm"))
      .agg(idset_merge(col("bm"))).collect()(0).getAs[Array[Byte]](0)
    assert(perPart.toSeq == bytesOf(1).toSeq)
  }

  test("bitmaps persist to parquet and re-merge across jobs") {
    val dir = tmpDir("bitmap")
    idsA.toDF("id").agg(idset_agg(col("id")).as("bm"))
      .write.mode("overwrite").parquet(s"$dir/a")
    idsB.toDF("id").agg(idset_agg(col("id")).as("bm"))
      .write.mode("overwrite").parquet(s"$dir/b")
    val n = spark.read.parquet(s"$dir/a").unionAll(spark.read.parquet(s"$dir/b"))
      .agg(idset_count(idset_merge(col("bm")))).collect()(0).getLong(0)
    assert(n == (idsA.toSet ++ idsB.toSet).size)
  }

  test("SQL surface via GraftExtensions") {
    idsA.toDF("id").createOrReplaceTempView("bitmap_ids")
    val n = spark.sql(
      "SELECT idset_count(idset_agg(id)) FROM bitmap_ids")
      .collect()(0).getLong(0)
    assert(n == idsA.toSet.size)
  }

  test("dense-domain contract violations fail loudly") {
    intercept[Exception] {
      Seq(-1L).toDF("id").agg(idset_agg(col("id"))).collect()
    }
    intercept[Exception] {
      Seq(MaxBit).toDF("id").agg(idset_agg(col("id"))).collect()
    }
  }
}
