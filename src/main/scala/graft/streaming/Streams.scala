package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.{Row, SparkSession}

import graft.model.Schemas
import graft.transform.Velib

/** Structured Streaming variant of the ingest→transform pipeline
  * (SURVEY.md §2.10). The reference "streams" by hourly cron
  * (`airflow/dags/etl_dag.py:317`, `catchup=False` `:318`,
  * `max_active_runs=1` `:319`); here the same semantics are native:
  * file-drop source + `Trigger.AvailableNow` processes exactly what
  * exists per run with checkpointed exactly-once bookkeeping, and
  * watermarked stateful dedup replaces the reference's duplicate-fact
  * appends (SURVEY.md §2.8).
  *
  * Transforms are shared with the batch path — the same
  * `DataFrame => DataFrame` functions run under `readStream`, so batch
  * and streaming cannot drift.
  */
object Streams {

  /** File-drop source of raw vélib snapshots (JSON lines). */
  def velibStream(spark: SparkSession, dropDir: String): DataFrame =
    spark.readStream.schema(Schemas.velibRaw).json(dropDir)

  /** Flatten + curate + watermarked stateful dedup on the report key.
    * State is bounded by the watermark (2 hours of event time —
    * stations report minutes-to-hours late, `research.ipynb` cell 3
    * observation), so executors never accumulate unbounded dedup state.
    * Works on any streaming DataFrame with the raw schema (file source
    * or MemoryStream in tests).
    */
  def dedupedStationUpdates(raw: DataFrame): DataFrame =
    Velib.curateStations(Velib.flattenStations(raw))
      .withWatermark("last_reported", "2 hours")
      .dropDuplicatesWithinWatermark("station_id", "last_reported")

  /** Hourly per-station availability aggregate with watermark — the
    * streaming twin of `Velib.hourlyAvailability`.
    */
  def hourlyAvailabilityStream(raw: DataFrame): DataFrame =
    Velib.curateStations(Velib.flattenStations(raw))
      .withWatermark("last_reported", "2 hours")
      .groupBy(window(col("last_reported"), "1 hour"), col("station_id"))
      .agg(max("num_bikes_available").as("max_bikes"),
        count(lit(1)).as("n_reports"))
      .select(col("window.start").as("hour_start"), col("station_id"),
        col("max_bikes"), col("n_reports"))

  /** J7 stream-stream join (SURVEY.md §2.4/§2.10): station updates ⋈ the
    * weather observation of the same hour at-or-before the report.
    *
    * Both sides are watermarked (2 h) and the join key is the HOUR BUCKET
    * plus a time-range residual — the equi key makes this a streaming
    * hash join co-partitioned on the hour, and together with the
    * watermarks it bounds the state store: each side's buffered rows are
    * evicted once the watermark passes their hour. A pure time-range
    * condition (no equi key) would buffer and scan far more state.
    *
    * @param stationsRaw raw vélib snapshots (velibRaw schema, streaming)
    * @param weatherRaw  raw weather snapshots (weatherRaw schema, streaming)
    */
  def stationWeatherJoin(stationsRaw: DataFrame, weatherRaw: DataFrame): DataFrame = {
    val st = Velib.curateStations(Velib.flattenStations(stationsRaw))
      .withWatermark("last_reported", "2 hours")
    val wx = graft.transform.Weather.projectWeather(weatherRaw)
      .withColumnRenamed("timestamp", "obs_ts")
      .withWatermark("obs_ts", "2 hours")
    st.join(
      wx,
      date_trunc("hour", col("last_reported")) === date_trunc("hour", col("obs_ts")) &&
        col("obs_ts") <= col("last_reported") &&
        col("obs_ts") > col("last_reported") - expr("INTERVAL 1 HOUR"),
      "inner")
      .select(col("station_id"), col("num_bikes_available"),
        col("last_reported"), col("obs_ts"), col("temp"),
        col("weather_description"))
  }

  /** Per-run writer: AvailableNow = process-what-exists then stop —
    * the `catchup=False` + `max_active_runs=1` semantics of the
    * reference, with checkpointed progress instead of Airflow metadata.
    */
  def availableNowParquetWriter(
      df: DataFrame, outPath: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
