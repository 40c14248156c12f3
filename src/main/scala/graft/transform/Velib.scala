package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Schemas.RunContext

/** Pure DataFrame => DataFrame transforms for the vélib station branch.
  *
  * Reference behavior: `airflow/dags/etl_dag.py:221-242` —
  * `pd.json_normalize(raw["data"]["stations"])`, keep 7 of 12 columns,
  * epoch seconds → `"%Y-%m-%d %H:%M:%S"`. Spark-first re-expression:
  * `explode` (the native flatten), column pruning pushed into the scan by
  * Catalyst, `timestamp_seconds` in the session (UTC) zone — this also
  * removes the reference's weather-vs-station timezone divergence
  * (SURVEY.md §1.3).
  */
object Velib {

  /** One row per station per snapshot (`etl_dag.py:225-226`).
    * `explode` distributes: each snapshot row fans out to its stations and
    * downstream operators see a flat relation — no driver-side loop, and
    * nested-schema pruning keeps the scan narrow.
    */
  def flattenStations(raw: DataFrame): DataFrame =
    raw.select(explode(col("data.stations")).as("s"))
      .select(col("s.*"))

  /** Keep the 7 curated columns (`etl_dag.py:228-238` keeps exactly these)
    * and convert `last_reported` epoch seconds to a UTC timestamp
    * (`etl_dag.py:240-242`).
    */
  def curateStations(flat: DataFrame): DataFrame =
    flat.select(
      col("station_id"),
      col("num_bikes_available"),
      col("num_docks_available"),
      col("is_installed"),
      col("is_returning"),
      col("is_renting"),
      timestamp_seconds(col("last_reported")).as("last_reported"))

  /** Mechanical / ebike split from `num_bikes_available_types` — the
    * array-of-single-key-maps shape observed at `research.ipynb` cell 3:
    * `[{mechanical: n}, {ebike: n}]`. Extraction is BY KEY, not by
    * position: a station reporting the entries reversed, or only one
    * of them, yields the right counts (or NULL for the absent kind)
    * instead of swapped values — and a short array would kill the job
    * under ANSI's element_at range check.
    */
  def withBikeTypes(flat: DataFrame): DataFrame = {
    def kindCount(key: String) = aggregate(
      col("num_bikes_available_types"),
      lit(null).cast("int"),
      (acc, m) => coalesce(acc, try_element_at(m, lit(key))))
    flat
      .withColumn("num_bikes_mechanical", kindCount("mechanical"))
      .withColumn("num_bikes_ebike", kindCount("ebike"))
  }

  /** Loader-injected run metadata (`airflow/plugins/s3_to_postgres.py:63-69`). */
  def withRunMetadata(df: DataFrame, ctx: RunContext): DataFrame =
    df.withColumn("execution_date", lit(ctx.executionDate).cast("timestamp"))
      .withColumn("dag_id", lit(ctx.dagId))
      .withColumn("task_id", lit(ctx.taskId))

  /** Surrogate key the reference prototyped but never used
    * (`research/research.ipynb` cell 4): station_id + "_" + last_reported.
    * Plain `concat`, NOT `concat_ws`: concat_ws silently SKIPS null
    * parts, so a NULL-ts re-report of station 1 keyed "1" — colliding
    * with a NULL-station row reported at epoch 1 — exactly the
    * malformed rows a surrogate key must keep apart. With concat a
    * missing part propagates NULL: visibly incomplete, never colliding
    * with a real key.
    */
  def withSurrogateKey(df: DataFrame): DataFrame =
    df.withColumn("id",
      concat(col("station_id").cast("string"), lit("_"),
        unix_timestamp(col("last_reported")).cast("string")))

  /** Drop exact re-reports: hourly snapshots re-deliver stations whose
    * `last_reported` did not change; the reference appends them as
    * duplicate facts (nothing dedups between `etl_dag.py:225-242` and the
    * insert at `s3_to_postgres.py:80-82`). Shuffles once on the dedup key —
    * at 100 TB this is a hash-partitioned exchange on (station_id,
    * last_reported), no skew (keys are near-unique).
    */
  def dedupSnapshots(df: DataFrame): DataFrame = {
    // deterministic survivor, not dropDuplicates' partition-order
    // pick: two re-reports sharing (station_id, last_reported) but
    // differing in a non-key column (the backend updates dock counts
    // without bumping the report time) must resolve to the SAME row
    // on every run/partitioning — the greatest attribute tuple, the
    // scd2Apply dedup convention
    val attrs = df.columns.filterNot(c =>
      c == "station_id" || c == "last_reported").toSeq
    df.groupBy(col("station_id"), col("last_reported"))
      .agg(max(struct(attrs.map(col): _*)).as("__best"))
      .select(Seq(col("station_id"), col("last_reported")) ++
        attrs.map(c => col(s"__best.$c").as(c)): _*)
      .select(df.columns.toSeq.map(col): _*)
  }

  /** Latest report per station — the window-dedup pattern replacing the
    * notebook's surrogate-key intent. Single shuffle on station_id.
    * The ordering is TOTAL (the [[dedupSnapshots]] convention): two
    * rows tying on last_reported — the backend's update-without-bump
    * behavior — resolve to the greatest attribute tuple on every
    * run/partitioning, never to whichever partition arrived first.
    */
  def latestPerStation(df: DataFrame): DataFrame = {
    require(!df.columns.contains("__v_rn"),
      "input column '__v_rn' collides with latestPerStation's scratch column")
    val attrs = df.columns.filterNot(c =>
      c == "station_id" || c == "last_reported").toSeq
    val tieBreak =
      if (attrs.isEmpty) Nil else Seq(struct(attrs.map(col): _*).desc)
    val w = Window.partitionBy(col("station_id"))
      .orderBy(col("last_reported").desc +: tieBreak: _*)
    df.withColumn("__v_rn", row_number().over(w))
      .filter(col("__v_rn") === 1)
      .drop("__v_rn")
  }

  /** The hourly aggregate's measure list — ONE definition consumed by
    * both [[hourlyAvailability]] (batch) and
    * `Streams.hourlyAvailabilityStream`, so the declared twins cannot
    * drift (they already had: the stream silently omitted `min_bikes`,
    * breaking any consumer written against the batch schema).
    */
  def hourlyMeasures: Seq[Column] = Seq(
    max(col("num_bikes_available")).as("max_bikes"),
    min(col("num_bikes_available")).as("min_bikes"),
    count(lit(1)).as("n_reports"))

  /** Hourly availability per station — the canonical query over this data
    * (SURVEY.md §2.5 A5): tumbling 1-hour buckets on the report time.
    */
  def hourlyAvailability(curated: DataFrame): DataFrame =
    curated
      .groupBy(
        window(col("last_reported"), "1 hour").getField("start").as("hour_start"),
        col("station_id"))
      .agg(hourlyMeasures.head, hourlyMeasures.tail: _*)
}
