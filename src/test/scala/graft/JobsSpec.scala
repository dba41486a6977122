package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.jobs._
import graft.schemas.Schemas

/** End-to-end pipeline slice on canned fixtures (FIXTURES.md):
  * extract → dims → fact, asserting idempotency and FK closure.
  */
class JobsSpec extends SparkSpec with JobFixtures {
  import scala.jdk.CollectionConverters._

  // --- the end-to-end slice (fixtures in JobFixtures) ---

  test("extract is idempotent: rerun appends zero; in-batch dup survives first write") {
    val lake = tmpDir("lake") + "/flights"
    val n1 = ExtractFlights.run(spark, FixtureSource, lake, "EDDF", day, day + 86399)
    assert(n1 == 5) // first write keeps the in-batch duplicate
    val n2 = ExtractFlights.run(spark, FixtureSource, lake, "EDDF", day, day + 86399)
    assert(n2 == 0) // count-equality short-circuit
    val stored = spark.read.parquet(lake)
    assert(stored.count() == 5)
    // partition layout is hive-style y/m/d
    assert(stored.filter(col("flight_year") === 2024 && col("flight_month") === 1).count() >= 3)
  }

  test("dims + fact end to end: cleansing, fallbacks, FK closure, idempotent append") {
    val lake = tmpDir("lake2") + "/flights"
    ExtractFlights.run(spark, FixtureSource, lake, "EDDF", day, day + 86399)
    val wh = new ParquetWarehouse(tmpDir("wh"))

    assert(LoadDimAirports.run(spark, wh, airports))
    assert(!LoadDimAirports.run(spark, wh, airports)) // unchanged -> skipped rewrite

    val dimAp = wh.table(spark, "dim_airports").collect()
    assert(dimAp.length == 3)
    val lhr = dimAp.find(_.getAs[String]("icao_code") == "EGLL").get
    assert(lhr.getAs[Float]("lat") == 51.0f)         // int -> float fix
    assert(lhr.isNullAt(lhr.fieldIndex("alt")))      // "-1" sentinel -> NULL

    assert(LoadDimDates.run(spark, wh, "2024-01-01", "2024-01-31") == 31)
    assert(LoadDimDates.run(spark, wh, "2024-01-01", "2024-01-31") == 0) // idempotent

    val flightsLake = spark.read.parquet(lake)
    assert(LoadDimAircrafts.run(spark, wh, aircraftsDf, manufacturersDf,
      typesDf, airlinesDf, Some(flightsLake)))

    val dimAc = wh.table(spark, "dim_aircrafts").collect()
    assert(dimAc.length == 2) // malformed + all-null rows dropped
    val lh = dimAc.find(_.getAs[String]("icao24_addr") == "3c6444").get
    assert(lh.getAs[String]("operating_airline") == "Lufthansa")  // airline join hit
    assert(lh.getAs[String]("manufacturer") == "AIRBUS")
    assert(lh.getAs[String]("aircraft_type") == "LandPlane")
    val fb = dimAc.find(_.getAs[String]("icao24_addr") == "abc123").get
    assert(fb.getAs[String]("operating_airline") == "NoIcao Air") // iata coalesce path
    assert(fb.isNullAt(fb.fieldIndex("registration")))            // -UNKNOWN- -> NULL
    assert(fb.isNullAt(fb.fieldIndex("line_num")))                // \tN/A -> NULL

    val n1 = LoadFctFlights.run(spark, wh, lake, 2024, 1, 1)
    assert(n1 == 4) // EXCEPT DISTINCT collapsed the in-batch duplicate
    val n2 = LoadFctFlights.run(spark, wh, lake, 2024, 1, 1)
    assert(n2 == 0) // idempotent replay, incl. the overnight-arrival row

    // FK closure: every fact FK resolves or is NULL from an unmatched left join
    val fct = wh.table(spark, "fct_flights")
    val dimIds = dimAc.map(_.getAs[Int]("aircraft_dim_id")).toSet
    fct.collect().foreach { r =>
      if (!r.isNullAt(r.fieldIndex("aircraft_dim_id")))
        assert(dimIds.contains(r.getAs[Int]("aircraft_dim_id")))
      // date key derives from the lake partition (= run date), never from
      // depart_ts — the overnight arrival must carry 20240101 too
      assert(r.getAs[Int]("flight_date_dim_id") == 20240101)
    }
    // the overnight arrival departed Dec 31 but keys to the run date
    val overnight = fct.filter(
      col("depart_ts") < to_timestamp(lit("2024-01-01 00:00:00"))).collect()
    assert(overnight.length == 1 &&
      overnight(0).getAs[Int]("flight_date_dim_id") == 20240101)
  }

  test("DailyPipeline runs the DAG order end to end; same-date replay writes zero everywhere") {
    val lake = tmpDir("lake3") + "/flights"
    val wh = new ParquetWarehouse(tmpDir("wh3"))
    val in = DailyPipeline.Inputs(FixtureSource, lake, airports,
      aircraftsDf, manufacturersDf, typesDf, airlinesDf)
    val p = DailyPipeline.Params("EDDF", java.time.LocalDate.of(2024, 1, 1),
      dimDatesStart = "2024-01-01", dimDatesEnd = "2024-01-31", retryDelayMs = 0L)

    val r1 = DailyPipeline.run(spark, wh, in, p)
    assert(r1 == DailyPipeline.Report(
      extractedRows = 5, airportsRewritten = true, datesAdded = 31,
      aircraftsRewritten = true, factRows = 4))
    // the composed run produced the same warehouse as the task-by-task spec
    assert(wh.table(spark, "dim_airports").count() == 3)
    assert(wh.table(spark, "dim_aircrafts").count() == 2)
    assert(wh.table(spark, "fct_flights").count() == 4)

    // Airflow skip-if-done semantics without the scheduler: a same-date
    // replay is all zeros/false — nothing appended, nothing rewritten
    val r2 = DailyPipeline.run(spark, wh, in, p)
    assert(r2 == DailyPipeline.Report(0L, false, 0L, false, 0L))
    assert(wh.table(spark, "fct_flights").count() == 4)
  }

  test("DailyPipeline retries only the extract seam (reference retries=5)") {
    val lake = tmpDir("lake4") + "/flights"
    val wh = new ParquetWarehouse(tmpDir("wh4"))
    var calls = 0
    val flaky = new FlightSource {
      def fetch(a: String, b: Long, e: Long, dir: String): Seq[Row] = {
        calls += 1
        if (calls <= 2) throw new RuntimeException(s"transient API failure $calls")
        FixtureSource.fetch(a, b, e, dir)
      }
    }
    val in = DailyPipeline.Inputs(flaky, lake, airports,
      aircraftsDf, manufacturersDf, typesDf, airlinesDf)
    val p = DailyPipeline.Params("EDDF", java.time.LocalDate.of(2024, 1, 1),
      dimDatesStart = "2024-01-01", dimDatesEnd = "2024-01-31", retryDelayMs = 0L)
    val r = DailyPipeline.run(spark, wh, in, p)
    assert(r.extractedRows == 5 && r.factRows == 4)
    assert(calls == 4) // 2 failed attempts, then departure+arrival succeed

    // retry budget exhausted -> the original failure surfaces
    val alwaysDown = new FlightSource {
      def fetch(a: String, b: Long, e: Long, dir: String): Seq[Row] =
        throw new RuntimeException("API down")
    }
    val ex = intercept[RuntimeException] {
      DailyPipeline.run(spark, new ParquetWarehouse(tmpDir("wh5")),
        in.copy(source = alwaysDown, lakeDir = tmpDir("lake5") + "/flights"),
        p.copy(extractRetries = 2))
    }
    assert(ex.getMessage == "API down")
  }

  test("cleanse order: sentinel-only rows survive as all-NULL, dropped-column-only rows don't") {
    // reference order is drop-cols -> dropna(all) -> filters -> sentinel-to-NULL
    val sentinelOnly = Row(null, "-UNKNOWN-", null, null, null, null, null, null,
      null, null, null, null, null, null, null) // only content is a sentinel word
    val droppedColsOnly = Row(null, null, null, null, null, null, null, null,
      null, null, null, null, null, "Sole Owner", null) // non-null only in `owner`
    val out = LoadDimAircrafts.cleanse(spark.createDataFrame(
      Seq(sentinelOnly, droppedColsOnly).asJava, Schemas.srcAircrafts)).collect()
    assert(out.length == 1) // dropped-cols-only row is gone...
    assert(out(0).isNullAt(out(0).fieldIndex("registration"))) // ...sentinel kept, nulled last
  }

  test("FK violation aborts the aircrafts dim publish") {
    val wh = new ParquetWarehouse(tmpDir("wh2"))
    val unknownFlights = spark.createDataFrame(
      Seq(Row("ffffff")).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("icao24",
          org.apache.spark.sql.types.StringType))))
    assertThrows[IllegalArgumentException] {
      LoadDimAircrafts.run(spark, wh, aircraftsDf, manufacturersDf,
        typesDf, airlinesDf, Some(unknownFlights))
    }
  }
}
