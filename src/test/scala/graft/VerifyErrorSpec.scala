package graft

import java.nio.file.{Files, Paths}

/** The correctness artifact must never SHRINK on failure (the r8 trap:
  * 13 broken queries vanished from the dump and the round read as a
  * false 100%). Pin the failure path: a query that throws still leaves
  * a one-row `__verify_error` marker dump — a schema no oracle can
  * match, so the driver's compare reports a failure instead of
  * dropping the query — plus an errors.json entry, while healthy
  * queries in the same run dump normally.
  */
class VerifyErrorSpec extends SparkSpec {

  test("a failing query leaves an error marker and an errors.json entry; healthy ones dump") {
    val out = tmpDir("verify-err")
    // a nonexistent sf dir makes the selected query throw at read time
    val errs = Verify.run(spark, "/nonexistent/sfdir", out, Some(Set("q1_agg")))
    assert(errs.keySet == Set("q1_agg"))
    val marker = spark.read.parquet(s"$out/q1_agg")
    assert(marker.columns.sameElements(Array("__verify_error")),
      "marker schema must be un-matchable by any oracle")
    assert(marker.count() == 1)
    val ej = new String(Files.readAllBytes(Paths.get(s"$out/errors.json")), "UTF-8")
    assert(ej.contains("q1_agg"), s"errors.json must name the failed query: $ej")
    // same run, healthy data: dump present, no error artifacts
    val out2 = tmpDir("verify-ok")
    val ok = Verify.run(spark, "/root/testdata/sf0.001", out2, Some(Set("q1_agg")))
    assert(ok.isEmpty)
    assert(spark.read.parquet(s"$out2/q1_agg").columns.contains("sum_qty"))
    val ej2 = new String(Files.readAllBytes(Paths.get(s"$out2/errors.json")), "UTF-8")
    assert(ej2 == "{}")
  }
}
