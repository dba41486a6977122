package graft

import org.apache.spark.sql.functions._

/** Null-content sweep: `documents` rows with NULL text/lang/source and
  * `embeddings` rows with a NULL vector must not crash any registered
  * query. (Null FIELDS are a different failure class from empty
  * TABLES — EmptyInputSpec — since expressions actually evaluate over
  * the null and every fold/HOF/regexp in the chain must propagate it.)
  * Queries may emit null-valued or fewer rows for such input; they may
  * not throw.
  */
class NullInputSpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    val dir = tmpDir("null-testdata")
    Tables.names.foreach { t =>
      val base = Tables.load(spark, "/root/testdata/sf0.001", t)
      val dirty = t match {
        case "documents" =>
          // half the rows keep content; the rest null out text/lang/source
          base.limit(20).union(
            base.limit(40).exceptAll(base.limit(20))
              .select(col("doc_id"),
                lit(null).cast("string").as("text"),
                lit(null).cast("string").as("lang"),
                lit(null).cast("string").as("source"),
                col("n_chars")))
        case "embeddings" =>
          base.limit(20).union(
            base.limit(40).exceptAll(base.limit(20))
              .select(col("vec_id"),
                lit(null).cast("array<float>").as("embedding"),
                col("label")))
        case _ => base.limit(50)
      }
      dirty.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query tolerates NULL text/lang/source/embedding values") {
    val failures = SparkEntry.registry.flatMap { q =>
      try { q.run(spark, dirtyDir).collect(); None }
      catch { case t: Throwable =>
        Some(s"${q.name}: ${t.getClass.getSimpleName} ${String.valueOf(t.getMessage).take(120)}")
      }
    }
    assert(failures.isEmpty,
      s"queries crashing on null content:\n  ${failures.mkString("\n  ")}")
  }
}
