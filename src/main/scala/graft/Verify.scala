package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — dump (and list in
    // oracle_sql.json) only those, for a fast local gate on a change
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = GraftSession.local()
    // exit 0 even on failures: the marker dumps + errors.json carry the
    // signal; a nonzero rc might make the driver skip the compare and
    // produce NO artifact, which is the very failure mode being fixed
    try run(spark, sfDir, outDir, only)
    finally spark.stop()
  }

  /** The dump body, separated from main so VerifyErrorSpec can drive
    * the failure path against the shared test session (main owns the
    * session lifecycle; run never stops it). Returns the per-query
    * error messages, empty when everything dumped.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Option[Set[String]] = None): Map[String, String] = {
    def selected(name: String): Boolean = only.forall(_.contains(name))
    new java.io.File(outDir).mkdirs()
    // A query that throws must STILL surface in the correctness artifact:
    // r8's 13 TIMESTAMP_NTZ failures were swallowed here (stderr only, no
    // dump), so CORRECTNESS_r08 shrank to 133 all-green entries and read
    // as a false 100%. On failure, write a one-row marker dump whose
    // schema (__verify_error) can never match any oracle — the driver's
    // compare then reports the query as a failure instead of dropping it
    // — plus a sidecar errors.json with the exception text.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${e.getMessage}"
          System.err.println(s"[verify] $name failed: $msg")
          errors(name) = msg
          try {
            import spark.implicits._
            Seq(msg).toDF("__verify_error").coalesce(1)
              .write.mode("overwrite").parquet(s"$outDir/$name")
          } catch { case _: Throwable => () }
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
    errors.toMap
  }
}
