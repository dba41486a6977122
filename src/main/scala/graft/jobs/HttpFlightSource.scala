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
  * payloads with zero network; `sleep` is injectable for the same
  * reason.
  *
  * Transient failures retry with bounded exponential backoff — the
  * reference runs the extract task with `retries=5` at the
  * orchestrator level (reference: flights_daily.py:57); here the retry
  * loop lives at the HTTP edge, where transient and permanent failures
  * can actually be told apart.
  */
final class HttpFlightSource(
    spark: SparkSession,
    baseUrl: String = "https://opensky-network.org/api",
    get: String => (Int, String) = HttpFlightSource.httpGet,
    maxRetries: Int = 5,
    sleep: Long => Unit = Thread.sleep) extends FlightSource {

  def fetch(airportIcao: String, beginTs: Long, endTs: Long,
            direction: String): Seq[Row] = {
    require(ExtractFlights.directions.contains(direction),
      s"invalid flight type '$direction' — must be one of ${ExtractFlights.directions}")
    val url =
      s"$baseUrl/flights/$direction?airport=$airportIcao&begin=$beginTs&end=$endTs"
    val (status, body) =
      HttpFlightSource.getWithRetries(get, url, maxRetries, sleep)
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

  /** Bounded exponential-backoff retry around one GET: a thrown
    * transport error, a 5xx, or a 429 is TRANSIENT and retries after
    * 1,2,4,8,16 s (doubling per attempt, `maxRetries` retries total);
    * any other status — including 4xx client errors, which a retry can
    * never fix — returns immediately and [[parseResponse]]'s
    * raise-for-status decides. An exhausted transient 5xx also returns
    * (same raise-for-status path); an exhausted transport error
    * rethrows its last exception.
    */
  @annotation.tailrec
  private[jobs] def getWithRetries(get: String => (Int, String), url: String,
                                   maxRetries: Int, sleep: Long => Unit,
                                   attempt: Int = 0): (Int, String) = {
    val res =
      try Right(get(url))
      catch { case e: java.io.IOException => Left(e) }
    val transient = res.fold(_ => true, r => r._1 >= 500 || r._1 == 429)
    if (!transient || attempt >= maxRetries)
      res.fold(e => throw e, identity)
    else {
      sleep(1000L << attempt)
      getWithRetries(get, url, maxRetries, sleep, attempt + 1)
    }
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
