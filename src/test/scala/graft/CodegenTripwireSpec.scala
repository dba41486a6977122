package graft

/** Registry-wide whole-stage-codegen tripwire. A `doGenCode`/`doConsume`
  * bug doesn't fail a query — Spark catches the janino compile error and
  * silently re-runs the stage interpreted, so every oracle stays green
  * while the hot path quietly de-optimizes (exactly how the broadcast
  * as-of fusion shipped inert in r14: its spec pinned PLAN shape, and
  * `spark.sql.codegen.fallback` defaulted on). This sweep executes every
  * registered query once at sf0.001 with fallback=false, which turns any
  * generated-code compile failure anywhere in the plan — custom execs in
  * `plans/`, expressions in `functions/` — into a hard, named failure.
  */
class CodegenTripwireSpec extends SparkSpec {

  test("every registered query executes compiled (codegen.fallback=false, wholeStage=true)") {
    val sf = "/root/testdata/sf0.001"
    val prevFb = spark.conf.get("spark.sql.codegen.fallback")
    val prevWsc = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val failures = try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      // CODEGEN_ONLY also disables the interpreted fallback for
      // projections/predicates built via
      // CodeGeneratorWithInterpretedFallback — an Expression whose
      // doGenCode emits broken Java fails HERE by name even when it
      // sits outside a whole-stage span
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      SparkEntry.registry.flatMap { q =>
        try { q.run(spark, sf).collect(); None }
        catch { case t: Throwable =>
          Some(s"${q.name}: ${t.getClass.getSimpleName} " +
            String.valueOf(t.getMessage).take(200))
        }
      }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFb)
      spark.conf.set("spark.sql.codegen.wholeStage", prevWsc)
      prevFm match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
    assert(failures.isEmpty,
      s"queries whose generated code fails to compile (or that crash " +
        s"under compiled execution):\n  ${failures.mkString("\n  ")}")
  }
}
