package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.model.Schemas.RunContext
import graft.sources.Sinks
import graft.transform.{Velib, Weather}

/** The composed end-to-end pipeline — the engine's equivalent of the
  * reference DAG's two branches (`airflow/dags/etl_dag.py:314-409`):
  * fetch → raw-zone land → transform → DDL → curated load. Each branch is
  * ordinary function composition; the lazy DataFrame chain is the DAG.
  *
  * Differences from the reference, by design (SURVEY.md §7.4):
  *  - loads are DEDUPED before append (`dropDuplicates` on the report
  *    key) — the reference re-inserts unchanged station reports hourly;
  *  - curated storage is parquet partitioned by ingest date instead of
  *    row-at-a-time INSERTs against Postgres;
  *  - both branches share one UTC timestamp semantics (the reference's
  *    weather branch uses container-local time, `etl_dag.py:94-96`).
  *
  * Returns the row counts the reference pushes through XCom
  * (`s3_to_postgres.py:84-86`).
  */
object Pipeline {

  final case class BranchResult(rawRows: Long, curatedRows: Long)

  /** Vélib branch (`etl_dag.py:366-405`). */
  def runStationBranch(
      spark: SparkSession,
      transport: Ingest.Transport,
      ctx: RunContext,
      rawZone: String,
      curatedPath: String,
      url: String = Ingest.VelibStatusUrl): BranchResult = {
    val raw = Ingest.fetchVelibSnapshot(spark, transport, url)
    Ingest.landRaw(raw, rawZone, ctx.executionDate.replaceAll("[^0-9]", ""))
    val curated = Velib.withRunMetadata(
      Velib.dedupSnapshots(
        Velib.curateStations(Velib.flattenStations(raw))), ctx)
    Sinks.writeCuratedParquet(
      curated.withColumn("ingest_date", col("execution_date").cast("date")),
      curatedPath, Seq("ingest_date"))
    BranchResult(raw.count(), curated.count())
  }

  /** Weather branch (`etl_dag.py:325-364`). */
  def runWeatherBranch(
      spark: SparkSession,
      transport: Ingest.Transport,
      ctx: RunContext,
      rawZone: String,
      curatedPath: String,
      url: String): BranchResult = {
    val raw = Ingest.fetchWeatherSnapshot(spark, transport, url)
    Ingest.landRaw(raw, rawZone, ctx.executionDate.replaceAll("[^0-9]", ""))
    val curated = Velib.withRunMetadata(Weather.projectWeather(raw), ctx)
    Sinks.writeCuratedParquet(
      curated.withColumn("ingest_date", col("execution_date").cast("date")),
      curatedPath, Seq("ingest_date"))
    BranchResult(raw.count(), curated.count())
  }

  /** Both branches, like start >> [weather, stations] >> end
    * (`etl_dag.py:409`). Sequential here — Spark schedules the stages;
    * concurrent submission via Futures adds nothing in local mode.
    */
  def runAll(
      spark: SparkSession,
      velibTransport: Ingest.Transport,
      weatherTransport: Ingest.Transport,
      weatherUrl: String,
      ctx: RunContext,
      baseDir: String): Map[String, BranchResult] = Map(
    "station_status" -> runStationBranch(spark, velibTransport, ctx,
      s"$baseDir/raw/velib", s"$baseDir/curated/station_status"),
    "weather" -> runWeatherBranch(spark, weatherTransport, ctx,
      s"$baseDir/raw/weather", s"$baseDir/curated/weather", weatherUrl))
}
