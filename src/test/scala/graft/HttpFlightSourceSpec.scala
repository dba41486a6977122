package graft

import graft.jobs.{ExtractFlights, HttpFlightSource}

/** The production REST binding on canned payloads — every validation
  * branch of the reference's process_response, zero network.
  */
class HttpFlightSourceSpec extends SparkSpec {

  private val goodPayload =
    """[
      |{"icao24":"3c6444","firstSeen":1704070800,"estDepartureAirport":"EDDF",
      | "lastSeen":1704074400,"estArrivalAirport":"EGLL","callsign":"DLH400",
      | "estDepartureAirportHorizDistance":200,"estDepartureAirportVertDistance":50,
      | "estArrivalAirportHorizDistance":300,"estArrivalAirportVertDistance":60,
      | "departureAirportCandidatesCount":1,"arrivalAirportCandidatesCount":2},
      |{"icao24":"abc123","firstSeen":1704076200,"estDepartureAirport":"EDDF",
      | "lastSeen":1704079200,"estArrivalAirport":"LFPG","callsign":null,
      | "estDepartureAirportHorizDistance":null,"estDepartureAirportVertDistance":null,
      | "estArrivalAirportHorizDistance":null,"estArrivalAirportVertDistance":null,
      | "departureAirportCandidatesCount":null,"arrivalAirportCandidatesCount":null}
      |]""".stripMargin

  private def source(status: Int, body: String, seenUrls: StringBuilder = new StringBuilder) =
    new HttpFlightSource(spark, baseUrl = "http://test/api",
      get = url => { seenUrls.append(url); (status, body) },
      sleep = _ => ()) // canned transport: back off instantly

  test("parses a good payload against the explicit schema, typed and ordered") {
    val urls = new StringBuilder
    val rows = source(200, goodPayload, urls).fetch("EDDF", 1704067200L, 1704153599L, "departure")
    assert(urls.toString ==
      "http://test/api/flights/departure?airport=EDDF&begin=1704067200&end=1704153599")
    assert(rows.length == 2)
    assert(rows.head.getAs[String]("icao24") == "3c6444")
    assert(rows.head.getAs[Long]("firstSeen") == 1704070800L)
    assert(rows.head.getAs[Short]("arrivalAirportCandidatesCount") == 2.toShort)
    assert(rows(1).isNullAt(rows(1).fieldIndex("callsign")))
  }

  test("raise-for-status: 4xx/5xx throw") {
    val e = intercept[java.io.IOException] {
      source(404, "not found").fetch("EDDF", 0L, 1L, "arrival")
    }
    assert(e.getMessage.contains("404"))
    intercept[java.io.IOException] {
      source(503, "busy").fetch("EDDF", 0L, 1L, "departure")
    }
  }

  test("flaky transport: transient 503s retry with exponential backoff, then succeed") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new HttpFlightSource(spark, baseUrl = "http://test/api",
      get = _ => { calls += 1; if (calls <= 3) (503, "busy") else (200, goodPayload) },
      sleep = sleeps.append(_))
    val rows = flaky.fetch("EDDF", 0L, 1L, "departure")
    assert(rows.length == 2)
    assert(calls == 4, "three failures + the success")
    assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L), "doubling backoff")
  }

  test("flaky transport: thrown IOExceptions retry; exhausted retries rethrow the last") {
    var calls = 0
    val recovering = new HttpFlightSource(spark, baseUrl = "http://test/api",
      get = _ => { calls += 1
        if (calls <= 2) throw new java.io.IOException("connection reset")
        (200, goodPayload) },
      sleep = _ => ())
    assert(recovering.fetch("EDDF", 0L, 1L, "departure").length == 2)
    assert(calls == 3)

    var downCalls = 0
    val down = new HttpFlightSource(spark, baseUrl = "http://test/api",
      get = _ => { downCalls += 1; throw new java.io.IOException("still down") },
      maxRetries = 5, sleep = _ => ())
    val e = intercept[java.io.IOException] { down.fetch("EDDF", 0L, 1L, "departure") }
    assert(e.getMessage == "still down")
    assert(downCalls == 6, "initial attempt + 5 retries, as the reference's retries=5")
  }

  test("client errors (4xx except 429) are permanent: no retries") {
    var calls = 0
    val notFound = new HttpFlightSource(spark, baseUrl = "http://test/api",
      get = _ => { calls += 1; (404, "not found") }, sleep = _ => ())
    intercept[java.io.IOException] { notFound.fetch("EDDF", 0L, 1L, "departure") }
    assert(calls == 1, "a 404 can never be fixed by retrying")
  }

  test("response check: empty payload and icao24-less first element fail") {
    intercept[IllegalStateException] {
      source(200, "[]").fetch("EDDF", 0L, 1L, "departure")
    }
    intercept[IllegalStateException] {
      source(200, """[{"callsign":"XYZ"}]""").fetch("EDDF", 0L, 1L, "departure")
    }
  }

  test("malformed JSON fails fast instead of degrading to NULL rows") {
    intercept[Exception] {
      source(200, "{not json").fetch("EDDF", 0L, 1L, "departure")
    }
  }

  test("invalid direction is rejected before any request") {
    intercept[IllegalArgumentException] {
      source(200, goodPayload).fetch("EDDF", 0L, 1L, "sideways")
    }
  }

  test("binds into ExtractFlights: canned-HTTP lake matches the fixture layout") {
    val lake = tmpDir("http-lake") + "/flights"
    val n = ExtractFlights.run(spark, source(200, goodPayload), lake,
      "EDDF", 1704067200L, 1704153599L)
    // same 2-row payload served for both directions; the first write keeps
    // in-batch duplicates (2 per direction), replay appends zero
    assert(n == 4)
    assert(ExtractFlights.run(spark, source(200, goodPayload), lake,
      "EDDF", 1704067200L, 1704153599L) == 0)
    val stored = spark.read.parquet(lake)
    assert(stored.count() == 4)
    assert(stored.schema.fieldNames.contains("flight_year"))
  }
}
