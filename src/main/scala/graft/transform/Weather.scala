package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weather branch transforms.
  *
  * Reference behavior: `airflow/dags/etl_dag.py:84-99` — hand-picks
  * `current.{temp, feels_like, pressure, humidity, wind_speed}`, the first
  * element of the `weather` array (`:93`), and formats `current.dt` epoch
  * seconds as `"%Y-%m-%d %H:%M:%S"` (`:94-96`). The reference uses
  * container-local `fromtimestamp` here but UTC for stations — the engine
  * normalizes both to UTC (SURVEY.md §1.3).
  *
  * Column contract is fixed by the golden sample
  * `research/weather_data.csv:1`:
  * temp,feels_like,pressure,humidity,wind_speed,weather_description,timestamp
  */
object Weather {

  def projectWeather(raw: DataFrame): DataFrame =
    raw.select(
      col("current.temp").as("temp"),
      col("current.feels_like").as("feels_like"),
      col("current.pressure").as("pressure"),
      col("current.humidity").as("humidity"),
      col("current.wind_speed").as("wind_speed"),
      // array index [0] (`etl_dag.py:93`); try_element_at is 1-based
      // and ANSI-safe: a present-but-EMPTY weather array (the API can
      // return one) reads NULL instead of killing the branch with
      // INVALID_ARRAY_INDEX under Spark 4's default ANSI mode — the
      // same hazard Velib.withBikeTypes guards with try_element_at
      try_element_at(col("current.weather"), lit(1))
        .getField("description").as("weather_description"),
      timestamp_seconds(col("current.dt")).as("timestamp"))

  /** String rendering matching the reference's strftime output
    * (`etl_dag.py:96`) for consumers that need the CSV-era contract.
    */
  def withFormattedTimestamp(df: DataFrame): DataFrame =
    df.withColumn("timestamp_str",
      date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss"))
}
