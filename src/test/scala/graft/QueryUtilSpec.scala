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

  test("the events table converts TIMESTAMP(NANOS) to microsecond timestamps") {
    val ev = QueryUtil.table(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1)
  }
}
