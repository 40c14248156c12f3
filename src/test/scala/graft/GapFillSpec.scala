package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.GapFill

class GapFillSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("spine covers each key's extent; gaps carry the last observation") {
    // key A: observations in buckets 0 and 30 (10-min step => gaps at
    // 10, 20); key B: a single observation (spine of one bucket)
    val df = Seq(
      ("A", ts(2), 1.0), ("A", ts(34), 4.0), ("B", ts(55), 9.0)
    ).toDF("k", "t", "v")
    val out = rows(GapFill.fillGaps(df, "k", "t", "v", stepSeconds = 600)
      .orderBy(col("k"), col("bucket")))
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 60000,
        r.getDouble(2), r.getBoolean(3)))
    assert(out === Seq(
      ("A", 0L, 1.0, true), ("A", 10L, 1.0, false), ("A", 20L, 1.0, false),
      ("A", 30L, 4.0, true),
      ("B", 50L, 9.0, true)))
  }

  test("multiple observations in one bucket keep the latest (ts tie -> larger value)") {
    val df = Seq(
      ("A", ts(1), 1.0), ("A", ts(8), 2.0),          // same bucket, 8 > 1
      ("A", ts(12), 5.0), ("A", ts(12), 7.0)          // exact ts tie
    ).toDF("k", "t", "v")
    val out = rows(GapFill.fillGaps(df, "k", "t", "v", stepSeconds = 600)
      .orderBy(col("bucket")))
      .map(r => (r.getTimestamp(1).getTime / 60000, r.getDouble(2)))
    assert(out === Seq((0L, 2.0), (10L, 7.0)))
  }

  test("reserved column collision fails fast") {
    val bad = Seq(("A", ts(0), 1.0)).toDF("k", "t", "v")
      .withColumn("__gf_bucket", lit(1))
    val e = intercept[IllegalArgumentException] {
      GapFill.fillGaps(bad, "k", "t", "v", 600)
    }
    assert(e.getMessage.contains("__gf_bucket"))
  }
}
