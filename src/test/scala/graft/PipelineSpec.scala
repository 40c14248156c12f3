package graft

import graft.ingest.{Ingest, Pipeline}
import graft.model.Schemas.RunContext

/** End-to-end pipeline composition: both reference branches run offline
  * through injected transports, land raw, and load deduped curated
  * parquet partitioned by ingest date.
  */
class PipelineSpec extends SparkTestBase {

  private def firstLine(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      .linesIterator.next()

  test("runAll: fetch -> raw land -> transform -> curated load, both branches") {
    val base = java.nio.file.Files.createTempDirectory("pipe").toString
    val ctx = RunContext("2024-02-01 01:00:00", "velib_spark", "load")
    val res = Pipeline.runAll(spark,
      velibTransport = _ => firstLine(s"$FixtureDir/station_status.json"),
      weatherTransport = _ => firstLine(s"$FixtureDir/weather.json"),
      weatherUrl = Ingest.weatherUrl(48.85, 2.35, "key"),
      ctx = ctx, baseDir = base)

    assert(res("station_status").curatedRows === 3)
    assert(res("weather").curatedRows === 1)

    val curated = spark.read.parquet(s"$base/curated/station_status")
    assert(curated.count() === 3)
    // partition layout by ingest date (prunable — SURVEY §4.2)
    assert(new java.io.File(s"$base/curated/station_status/ingest_date=2024-02-01").exists())
    // raw zone is replayable: the landed snapshot re-parses
    assert(spark.read.schema(graft.model.Schemas.velibRaw)
      .json(s"$base/raw/velib").count() === 1)

    // re-running the same execution_date fails on the raw zone
    // (non-replacing K1) instead of double-loading
    intercept[Exception] {
      Pipeline.runStationBranch(spark,
        _ => firstLine(s"$FixtureDir/station_status.json"), ctx,
        s"$base/raw/velib", s"$base/curated/station_status")
    }
  }

  test("runAll retries a flaky fetch per the reference's task-retry policy") {
    val base = java.nio.file.Files.createTempDirectory("piperetry").toString
    val ctx = RunContext("2024-02-02 01:00:00", "velib_spark", "load")
    var velibCalls, weatherCalls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    // vélib fetch fails twice then recovers; weather succeeds at once —
    // the run must complete with NO wall-clock sleeps (injected sleeper)
    val res = Pipeline.runAll(spark,
      velibTransport = { _ =>
        velibCalls += 1
        if (velibCalls < 3) throw new RuntimeException("HTTP 503")
        firstLine(s"$FixtureDir/station_status.json")
      },
      weatherTransport = { _ =>
        weatherCalls += 1; firstLine(s"$FixtureDir/weather.json")
      },
      weatherUrl = Ingest.weatherUrl(48.85, 2.35, "key"),
      ctx = ctx, baseDir = base,
      retryDelayMs = 300000L, sleeper = sleeps.append(_))
    assert(res("station_status").curatedRows === 3)
    assert(velibCalls === 3 && weatherCalls === 1)
    assert(sleeps.toSeq === Seq(300000L, 600000L),
      "reference 5-min base delay, exponential, only the failing branch sleeps")
  }
}
