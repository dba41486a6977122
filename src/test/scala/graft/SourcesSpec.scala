package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.schemas.Schemas

/** Real file-format sources (SURVEY §2.1 S4/S5): headerless CSV with a
  * forced schema, and multiLine JSON with a rows wrapper.
  */
class SourcesSpec extends SparkSpec {

  test("headerless CSV read with explicit schema + offset header skip") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(s"$dir/manufacturers.csv"),
      "Code,Name\nAIRB,AIRBUS\nBOE,BOEING\n")
    val df = spark.read.schema(Schemas.srcManufacturers).csv(s"$dir/manufacturers.csv")
    assert(df.count() == 3) // header-ish row is data in the reference layout
    val skipped = graft.jobs.LoadDimAircrafts.prepareManufacturers(
      df.orderBy(col("Code") =!= "Code")) // header row first, as in file order
    assert(skipped.count() == 2)
    assert(skipped.columns.toSeq == Seq("mfr_code", "manufacturer"))
  }

  test("multiLine JSON with rows wrapper -> explode to records") {
    val dir = tmpDir("json")
    Files.writeString(Paths.get(s"$dir/airports.json"),
      """{"rows": [
        |  {"name": "Frankfurt", "iata": "FRA", "icao": "EDDF", "country": "Germany", "lat": 50.03, "lon": 8.57, "alt": 364},
        |  {"name": "Heathrow", "iata": "LHR", "icao": "EGLL", "country": "UK", "lat": 51, "lon": 0, "alt": -1}
        |]}""".stripMargin)
    val raw = spark.read.option("multiLine", true).json(s"$dir/airports.json")
    val rows = raw.select(explode(col("rows")).as("r")).select("r.*")
    assert(rows.count() == 2)
    // mixed int/double lat survives as double under inference
    assert(rows.filter(col("icao") === "EGLL").collect()(0).getAs[Any]("lat") == 51.0)
  }

  test("partitioned parquet lake round-trip prunes on partition filters") {
    val dir = tmpDir("lakefmt") + "/t"
    import spark.implicits._
    Seq((2024, 1, 1, "a"), (2024, 1, 2, "b"), (2024, 2, 1, "c"))
      .toDF("y", "m", "d", "v")
      .write.partitionBy("y", "m", "d").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"y" === 2024 && $"m" === 1 && $"d" === 2)
    assert(pruned.select("v").collect().map(_.getString(0)).toSeq == Seq("b"))
    // partition pruning visible in the plan: no partition filter residue in data filters
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
  }

  test("parquet schema evolution: mergeSchema unions old and new batch columns") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = tmpDir("schema-evolution")
    val spark2 = spark; import spark2.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.5)).toDF("id", "v", "score") // later batch adds a column
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    // old rows surface the new column as null; new rows keep their value
    assert(merged.filter(col("id") === 1L).select("score").collect()(0).isNullAt(0))
    assert(merged.filter(col("id") === 3L).select("score").collect()(0).getDouble(0) == 0.5)
    assert(merged.count() == 3)
  }

  test("CSV and JSON-lines sinks round-trip with explicit schemas") {
    import org.apache.spark.sql.functions.col
    val src = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    val csvDir = tmpDir("csv-rt"); val jsonDir = tmpDir("json-rt")
    src.write.mode("overwrite").option("header", "true").csv(csvDir)
    src.write.mode("overwrite").json(jsonDir)
    val fromCsv = spark.read.schema(src.schema).option("header", "true").csv(csvDir)
    val fromJson = spark.read.schema(src.schema).json(jsonDir)
    assert(fromCsv.except(src).isEmpty && src.except(fromCsv).isEmpty)
    assert(fromJson.except(src).isEmpty && src.except(fromJson).isEmpty)
  }

  test("FAILFAST surfaces malformed records instead of silently nulling them") {
    val dir = tmpDir("failfast")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.json"),
      "{\"id\": 1}\n{\"id\": \"not-a-number\"}\n".getBytes)
    val read = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL("id INT"))
      .option("mode", "FAILFAST").json(dir)
    val thrown = intercept[org.apache.spark.SparkException](read.collect())
    assert(thrown.getMessage.contains("MALFORMED_RECORD") ||
      String.valueOf(thrown.getCause).contains("Malformed"))
  }

  test("ORC round-trip preserves rows, schema and predicate pushdown") {
    val src = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val dir = tmpDir("orc-roundtrip")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema)
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
    val filtered = back.filter(org.apache.spark.sql.functions.col("c_custkey") === 1L)
    assert(filtered.queryExecution.executedPlan.toString.contains("PushedFilters"),
      "ORC scan must push the key predicate down")
  }
}
