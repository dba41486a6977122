package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Registry-wide pin of the driver-comparator contract: every
  * oracle-gated query's output schema must be scalar-only at the top
  * level. The driver's pandas-side compare hashes cell VALUES after
  * sorting columns by name, and a top-level array/map/struct cell
  * arrives as an engine-specific object rendering — parquet list via
  * pyarrow vs DuckDB's native list — so even value-identical results
  * hash-mismatch. The house convention is to serialize (array_join /
  * to_json / concat_ws) before returning, as q_array_funcs does
  * (queries/FunctionQueries.scala); q_feature_hashing and
  * q_inverted_index regressed exactly this way in round 9 and were
  * caught only at the driver gate. This spec catches the next one at
  * commit time.
  *
  * Schema derivation builds each query's plan at sf0.001 without
  * executing it (analysis only), so the sweep is cheap; queries whose
  * run() does driver-side fitting (model collects) still pay only
  * their fit, once, at the smallest sf.
  */
class ComparatorContractSpec extends SparkSpec {

  test("every oracle-gated query returns only scalar top-level columns") {
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.registry.filter(_.oracle.isDefined).flatMap { q =>
      val complex = q.run(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"${f.name}: ${f.dataType.simpleString}"
      }
      if (complex.isEmpty) None
      else Some(s"${q.name} -> ${complex.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "oracle-gated queries with top-level complex types (serialize with " +
        s"array_join/to_json before returning):\n  ${offenders.mkString("\n  ")}")
  }
}
