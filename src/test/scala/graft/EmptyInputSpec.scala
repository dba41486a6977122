package graft

/** Robustness sweep: every registered query must RUN (not necessarily
  * return rows) against schema-identical EMPTY tables. At 100 TB the
  * empty case is routine — a new date partition, a filtered-out
  * source, a cold-start corpus — and an operator that throws on zero
  * rows (head on an empty model fetch, a null fold seed, an
  * element_at on a missing struct) takes the whole pipeline down.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = tmpDir("empty-testdata")
    Tables.names.foreach { t =>
      Tables.load(spark, "/root/testdata/sf0.001", t)
        .limit(0).write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query runs on empty tables without throwing") {
    val failures = SparkEntry.registry.flatMap { q =>
      try { q.run(spark, emptyDir).collect(); None }
      catch { case t: Throwable =>
        Some(s"${q.name}: ${t.getClass.getSimpleName} ${String.valueOf(t.getMessage).take(120)}")
      }
    }
    assert(failures.isEmpty,
      s"queries crashing on empty input:\n  ${failures.mkString("\n  ")}")
  }
}
