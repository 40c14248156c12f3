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
}
