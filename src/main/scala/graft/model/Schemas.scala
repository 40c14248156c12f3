package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the raw JSON payloads the reference ingests.
  *
  * The engine never relies on schema inference for raw zones (reference
  * parses blindly with `json.load`: `airflow/dags/etl_dag.py:81`, `:222`);
  * we declare the observed shapes (SURVEY.md §1.2, FIXTURES.md) so a
  * malformed payload fails fast instead of silently shifting types.
  */
object Schemas {

  /** Vélib GBFS `station_status.json` — shape observed at
    * `research/research.ipynb` cell 3; fetched at `etl_dag.py:182-184`.
    * `station_id` MUST be LongType: observed ids up to 19179944124 > 2^31
    * (a FloatType port, as the reference DDL implies at `etl_dag.py:270`,
    * would corrupt ids above 2^24 — SURVEY.md §1.2).
    */
  val velibRaw: StructType = StructType(Seq(
    StructField("lastUpdatedOther", LongType),
    StructField("ttl", LongType),
    StructField("data", StructType(Seq(
      StructField("stations", ArrayType(StructType(Seq(
        StructField("station_id", LongType),
        StructField("num_bikes_available", IntegerType),
        StructField("numBikesAvailable", IntegerType),
        StructField("num_bikes_available_types",
          ArrayType(MapType(StringType, IntegerType))),
        StructField("num_docks_available", IntegerType),
        StructField("numDocksAvailable", IntegerType),
        StructField("is_installed", IntegerType),
        StructField("is_returning", IntegerType),
        StructField("is_renting", IntegerType),
        StructField("last_reported", LongType),
        StructField("stationCode", StringType)
      ))))
    )))
  ))

  /** OpenWeatherMap onecall — shape observed at `research.ipynb` cell 1;
    * fetched at `etl_dag.py:43-45`. Only `current` is consumed
    * (`etl_dag.py:84-99`); `weather` is an array of structs of which
    * element 0 is read (`etl_dag.py:93`); `rain`/`snow` are optional
    * single-key maps (key "1h").
    */
  val weatherRaw: StructType = StructType(Seq(
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("timezone", StringType),
    StructField("current", StructType(Seq(
      StructField("dt", LongType),
      StructField("sunrise", LongType),
      StructField("sunset", LongType),
      StructField("temp", DoubleType),
      StructField("feels_like", DoubleType),
      StructField("pressure", IntegerType),
      StructField("humidity", IntegerType),
      StructField("dew_point", DoubleType),
      StructField("uvi", DoubleType),
      StructField("clouds", IntegerType),
      StructField("visibility", IntegerType),
      StructField("wind_speed", DoubleType),
      StructField("wind_deg", IntegerType),
      StructField("weather", ArrayType(StructType(Seq(
        StructField("id", IntegerType),
        StructField("main", StringType),
        StructField("description", StringType),
        StructField("icon", StringType)
      )))),
      StructField("rain", MapType(StringType, DoubleType)),
      StructField("snow", MapType(StringType, DoubleType))
    )))
  ))

  /** Curated station_status row — corrected types per SURVEY.md §1.2
    * (reference DDL at `etl_dag.py:266-280` declares FLOAT/TEXT for
    * integer flags; we keep the semantically correct types).
    */
  case class StationStatus(
      station_id: Long,
      num_bikes_available: Int,
      num_docks_available: Int,
      is_installed: Int,
      is_returning: Int,
      is_renting: Int,
      last_reported: java.sql.Timestamp)

  /** Curated weather observation row — column contract fixed by the
    * reference golden sample `research/weather_data.csv:1`.
    */
  case class WeatherObs(
      temp: Double,
      feels_like: Double,
      pressure: Int,
      humidity: Int,
      wind_speed: Double,
      weather_description: String,
      timestamp: java.sql.Timestamp)

  /** Run metadata injected by the loader
    * (`airflow/plugins/s3_to_postgres.py:63-69`).
    */
  case class RunContext(executionDate: String, dagId: String, taskId: String)
}
