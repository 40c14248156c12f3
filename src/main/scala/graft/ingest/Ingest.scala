package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.Schemas

/** S1/S2 HTTP snapshot ingestion (SURVEY.md §2.1).
  *
  * The reference fetches with `requests.get` inside an Airflow task
  * (`airflow/dags/etl_dag.py:27-49` weather, `:168-188` vélib) and spools
  * the body to S3. Here the imperative edge is confined to a single
  * `Transport` function — the HTTP GET — and everything after it is the
  * schema'd JSON path shared with the file sources: the body becomes a
  * one-element `Dataset[String]` parsed with the explicit raw schema
  * (FAILFAST), so a malformed payload fails the run exactly like the
  * reference's crash-and-retry (`etl_dag.py:331-332`).
  *
  * The transport is injectable, which keeps ingestion unit-testable in
  * this offline harness (tests feed canned bodies) and cleanly swaps for
  * a real client in deployment. Driver-side fetch of a ~344 KB snapshot
  * (`research.ipynb` cell 3) is the right shape at any scale: the
  * payload is one API response, not a distributed dataset — parallelism
  * begins after parse+explode.
  */
object Ingest {

  /** The one imperative edge: URL -> body. */
  type Transport = String => String

  /** `java.net.http` GET negotiating JSON, as the reference's fetch
    * does (`etl_dag.py:40-42`). Content negotiation on a body-less GET
    * is the `Accept` header, not `Content-Type`. Offline harness never
    * calls this — tests inject canned transports.
    */
  def httpTransport(timeoutMs: Long = 30000): Transport = {
    // One client per transport, not per request: HttpClient owns a
    // selector thread + connection pool and has no close() on Java 17,
    // so a per-call client leaks threads until GC under periodic fetch.
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    url =>
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Accept", "application/json")
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"GET $url -> HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** App-level retry/backoff combinator over any [[Transport]] — the
    * reference retries every task 3× with a 5-minute delay
    * (`etl_dag.py:331-332`, the DAG-wide `retries`/`retry_delay`
    * defaults); SURVEY §2.11 maps that orchestration behavior to an
    * app-level retry wrapper on the one imperative edge. Composable
    * (`withRetry(3, 1000)(httpTransport())`), exponential backoff
    * (delay, 2·delay, 4·delay, …), and the sleeper is injectable so
    * tests count attempts without wall-clock sleeps. Retries on any
    * NonFatal throw — the transport already converts non-200 statuses
    * to throws, so status retry falls out. The LAST failure propagates
    * when attempts are exhausted (the reference marks the task failed
    * after its final retry the same way). The doubling is capped at
    * 2^20 × the base delay: an uncapped shift overflows Long around
    * attempt 46 and Thread.sleep(negative) would then throw an
    * IllegalArgumentException that MASKS the transport's real error.
    */
  def withRetry(
      attempts: Int, backoffMs: Long,
      sleeper: Long => Unit = Thread.sleep)(t: Transport): Transport = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    require(backoffMs >= 0 && backoffMs <= 86400000L,
      s"backoffMs must be in [0, 1 day], got $backoffMs")
    url => {
      var tryNo = 0
      var result: Option[String] = None
      var last: Throwable = null
      while (result.isEmpty && tryNo < attempts) {
        if (tryNo > 0) sleeper(backoffMs << math.min(tryNo - 1, 20))
        try result = Some(t(url))
        catch { case scala.util.control.NonFatal(e) => last = e }
        tryNo += 1
      }
      result.getOrElse(throw last)
    }
  }

  /** OpenWeatherMap onecall URL (`etl_dag.py:43` — lat/lon fixed to
    * Paris at `:36-37`; key from config, never hardcoded).
    */
  def weatherUrl(lat: Double, lon: Double, apiKey: String): String =
    s"https://api.openweathermap.org/data/2.5/onecall?lat=$lat&lon=$lon&appid=$apiKey"

  /** Vélib GBFS station_status URL (`etl_dag.py:182`). */
  val VelibStatusUrl =
    "https://velib-metropole-opendata.smovengo.cloud/opendata/Velib_Metropole/station_status.json"

  private def parse(
      spark: SparkSession, body: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(Seq(body))
    spark.read.schema(schema).option("mode", "FAILFAST").json(ds)
  }

  /** S2: fetch one vélib snapshot -> raw DataFrame (velibRaw schema).
    * The top-level `data` field is REQUIRED after parse: FAILFAST only
    * catches malformed JSON — a well-formed body missing the field
    * (producer schema rename) parses NULL and would land a silently
    * empty payload; the check replays the reference's pandas
    * KeyError crash on the one-row snapshot.
    */
  def fetchVelibSnapshot(
      spark: SparkSession, transport: Transport,
      url: String = VelibStatusUrl): DataFrame =
    graft.sources.Sources.requireTopField(
      parse(spark, transport(url), Schemas.velibRaw), "data")

  /** S1: fetch one weather snapshot -> raw DataFrame (weatherRaw
    * schema). `current` required after parse, like the vélib branch.
    */
  def fetchWeatherSnapshot(
      spark: SparkSession, transport: Transport, url: String): DataFrame =
    graft.sources.Sources.requireTopField(
      parse(spark, transport(url), Schemas.weatherRaw), "current")

  /** K1 raw-zone landing: non-replacing timestamped JSON write, the
    * replayable raw zone (`etl_dag.py:46-55` — upload without `replace`).
    */
  def landRaw(raw: DataFrame, rawZoneDir: String, runTs: String): Unit =
    raw.write.mode("errorifexists").json(s"$rawZoneDir/ingest_ts=$runTs")
}
