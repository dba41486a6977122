package graft

import org.apache.spark.sql.functions._
import graft.ops.ScdOps

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: Seq[(Int, String, String, String)]) =
    rows.toDF("id", "seg", "vf", "vt")
      .select(col("id"), col("seg"),
        to_date(col("vf")).as("valid_from"), to_date(col("vt")).as("valid_to"))

  test("scd2Merge: keep unchanged, close+insert changed, insert new, keep absent open") {
    val current = dim(Seq(
      (1, "A", "2023-01-01", null),          // unchanged in snapshot
      (2, "B", "2023-01-01", null),          // changes to X
      (2, "OLD", "2022-01-01", "2023-01-01"), // closed history — immutable
      (3, "C", "2023-01-01", null)))          // absent from snapshot
    val snapshot = Seq((1, "A"), (2, "X"), (4, "D")).toDF("id", "seg")
    val out = ScdOps.scd2Merge(current, snapshot, "id", Seq("seg"), "2024-06-01")
      .collect().map(r => (r.getInt(0), r.getString(1),
        String.valueOf(r.getDate(2)), String.valueOf(r.getDate(3)))).toSet
    assert(out == Set(
      (1, "A", "2023-01-01", "null"),       // kept
      (2, "OLD", "2022-01-01", "2023-01-01"), // history untouched
      (2, "B", "2023-01-01", "2024-06-01"), // closed
      (2, "X", "2024-06-01", "null"),       // new version
      (3, "C", "2023-01-01", "null"),       // soft-absent stays open
      (4, "D", "2024-06-01", "null")))      // brand new key
  }

  test("scd2Merge: null attribute values compare as values, not wildcards") {
    val current = dim(Seq((1, null, "2023-01-01", null), (2, "B", "2023-01-01", null)))
    val snapshot = Seq((1, Option.empty[String]), (2, Option.empty[String]))
      .toDF("id", "seg")
    val out = ScdOps.scd2Merge(current, snapshot, "id", Seq("seg"), "2024-06-01")
      .collect()
    // id 1: null == null -> kept; id 2: "B" -> null is a CHANGE
    assert(out.length == 3)
    assert(out.count(r => r.getInt(0) == 2) == 2, "changed-to-null must close+insert")
  }

  test("scd2Merge is idempotent: re-merging the same snapshot changes nothing") {
    val current = dim(Seq((1, "A", "2023-01-01", null), (2, "B", "2023-01-01", null)))
    val snapshot = Seq((1, "A"), (2, "X")).toDF("id", "seg")
    val once = ScdOps.scd2Merge(current, snapshot, "id", Seq("seg"), "2024-06-01")
    val twice = ScdOps.scd2Merge(once, snapshot, "id", Seq("seg"), "2024-07-01")
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }
}
