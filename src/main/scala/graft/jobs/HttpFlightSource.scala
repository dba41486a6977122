package graft.jobs

import org.apache.spark.sql.{Dataset, Row, SparkSession}

/** Production [[FlightSource]]: the OpenSky `/flights/{direction}` REST
  * endpoint over `java.net.http`, with the reference's response
  * handling (reference: extract_flights.py:103-145):
  *
  *   - request `GET {base}/flights/{direction}?airport=&begin=&end=`
  *     with the direction validated up front (`request_opensky`);
  *   - raise-for-status on any 4xx/5xx (`process_response`);
  *   - sanity-probe the payload — the first element must carry an
  *     `icao24` (`response_check = res.json()[0]["icao24"]`);
  *   - parse the JSON array against the EXPLICIT srcFlights API schema.
  *
  * Parsing delegates to Spark's own JSON reader in FAILFAST mode rather
  * than a hand-rolled mapper: the same schema that governs the lake
  * governs the payload, and malformed JSON fails the job instead of
  * degrading to NULL rows. The transport is a plain `String => (status,
  * body)` function so tests exercise every validation branch on canned
  * payloads with zero network.
  */
final class HttpFlightSource(
    spark: SparkSession,
    baseUrl: String = "https://opensky-network.org/api",
    get: String => (Int, String) = HttpFlightSource.httpGet) extends FlightSource {

  def fetch(airportIcao: String, beginTs: Long, endTs: Long,
            direction: String): Seq[Row] = {
    require(ExtractFlights.directions.contains(direction),
      s"invalid flight type '$direction' — must be one of ${ExtractFlights.directions}")
    val url =
      s"$baseUrl/flights/$direction?airport=$airportIcao&begin=$beginTs&end=$endTs"
    val (status, body) = get(url)
    HttpFlightSource.parseResponse(spark, status, body)
  }
}

object HttpFlightSource {

  /** Default transport: blocking GET, body as UTF-8 string. */
  def httpGet(url: String): (Int, String) = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(120)).GET().build()
    val res = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  /** Validate + parse one response (reference: extract_flights.py:120-145).
    * Throws on non-2xx status, malformed JSON, or a payload whose first
    * element lacks an `icao24` — the reference's sanity probe.
    */
  def parseResponse(spark: SparkSession, status: Int, body: String): Seq[Row] = {
    if (status < 200 || status >= 300)
      throw new java.io.IOException(s"OpenSky request failed with HTTP $status")
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(Seq(body))
    val rows = spark.read
      .schema(ExtractFlights.apiSchema)
      .option("mode", "FAILFAST")
      .json(ds)
      .collect()
      .toIndexedSeq
    // response_check: res.json()[0]["icao24"] — empty payloads and
    // icao24-less first elements both fail the probe
    if (rows.isEmpty || rows.head.isNullAt(rows.head.fieldIndex("icao24")))
      throw new IllegalStateException(
        "Response check failed: payload empty or first element lacks icao24")
    rows
  }
}
