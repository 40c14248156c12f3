package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import java.nio.file.Files

import graft.queries.QueryUtil

class QueryUtilSpec extends SparkTestBase {
  import spark.implicits._

  test("nanos handling is scoped by table name: a bigint ts elsewhere stays a long") {
    val dir = Files.createTempDirectory("qu").toString
    // an ordinary epoch-seconds log whose column happens to be named ts
    Seq((1L, 1706745000L), (2L, 1706745060L)).toDF("id", "ts")
      .write.parquet(s"$dir/clicks.parquet")
    val back = QueryUtil.table(spark, dir, "clicks")
    assert(back.schema("ts").dataType === LongType,
      "a non-events bigint ts must NOT be reinterpreted as nanoseconds")
    assert(rows(back.orderBy(col("id"))).map(_.getLong(1)) ===
      Seq(1706745000L, 1706745060L))
  }

  test("the events table surfaces ts as session-zone TimestampType whatever the footer unit") {
    val ev = QueryUtil.table(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1)
  }

  test("a declared NANOS column still lands as microsecond TimestampType") {
    // The harness has regenerated events.parquet with plain timestamp[us]
    // at least once; this synthetic NTZ file pins the normalization the
    // loader applies in that regime (NTZ -> session-zone timestamp, UTC
    // session => identical instants).
    val dir = Files.createTempDirectory("qu-ntz").toString
    spark.sql(
      "SELECT 1L AS event_id, TIMESTAMP_NTZ '2024-02-01 00:30:00' AS ts")
      .write.parquet(s"$dir/events.parquet")
    val back = QueryUtil.table(spark, dir, "events")
    assert(back.schema("ts").dataType === TimestampType)
    assert(rows(back).map(_.getTimestamp(1).toInstant.toString) ===
      Seq("2024-02-01T00:30:00Z"))
  }
}
