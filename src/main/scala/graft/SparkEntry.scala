package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{LlmQueries, PipelineQueries, RelationalQueries, StreamQueries}
import graft.sources.Sources
import graft.transform.Velib

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query: the reference's core hourly slice
    * (flatten -> curate -> dedup -> latest-per-station,
    * /root/reference/airflow/dags/etl_dag.py:225-242 + the §2.8 dedup fix)
    * over the committed raw fixture. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Velib.latestPerStation(Velib.dedupSnapshots(Velib.curateStations(
      Velib.flattenStations(
        Sources.readVelibRaw(spark, s"${graft.queries.QueryUtil.fixtureRoot}/station_status.json")))))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries ++
      LlmQueries.queries ++ StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ PipelineQueries.oracleSql ++
      LlmQueries.oracleSql ++ StreamQueries.oracleSql
}
