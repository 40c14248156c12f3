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

  test("output-name collisions fail fast (key named like an output column)") {
    val df = Seq(("A", ts(0), 1.0)).toDF("bucket", "t", "v")
    val e = intercept[IllegalArgumentException] {
      GapFill.fillGaps(df, "bucket", "t", "v", 600)
    }
    assert(e.getMessage.contains("bucket"))
    val df2 = Seq(("A", ts(0), 1.0)).toDF("e", "t", "v")
    val e2 = intercept[IllegalArgumentException] {
      GapFill.ewma(df2, "e", "t", "v", 0.5)
    }
    assert(e2.getMessage.contains("'e'"))
  }

  test("ewma replays the sequential recursion per key, s_0 = x_0") {
    val df = Seq(
      ("A", ts(0), 8.0), ("A", ts(1), 4.0), ("A", ts(2), 2.0),
      ("B", ts(5), 10.0)
    ).toDF("k", "t", "v").repartition(3) // fold must not depend on layout
    val out = rows(GapFill.ewma(df, "k", "t", "v", alpha = 0.5)
      .orderBy(col("k"), col("t")))
      .map(r => (r.getString(0), r.getDouble(2)))
    // A: 8; 0.5*4+0.5*8 = 6; 0.5*2+0.5*6 = 4. B: seed only.
    assert(out === Seq(("A", 8.0), ("A", 6.0), ("A", 4.0), ("B", 10.0)))
  }

  test("ewma orders ties by (ts, value) and drops null observations") {
    val df = Seq(
      ("A", ts(1), Some(4.0)), ("A", ts(1), Some(2.0)), // ts tie: 2 folds first
      ("A", ts(2), None), ("A", ts(3), Some(6.0))
    ).toDF("k", "t", "v")
    val out = rows(GapFill.ewma(df, "k", "t", "v", alpha = 0.25)
      .orderBy(col("t"), col("ewma"))).map(_.getDouble(2))
    // 2; 0.25*4+0.75*2 = 2.5; null dropped; 0.25*6+0.75*2.5 = 3.375
    assert(out === Seq(2.0, 2.5, 3.375))
  }

  test("ewma rejects non-dyadic alpha (the 1-alpha literal trap) and reserved columns") {
    val df = Seq(("A", ts(0), 1.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      GapFill.ewma(df, "k", "t", "v", alpha = 0.3)
    }
    assert(e.getMessage.contains("dyadic"))
    val e2 = intercept[IllegalArgumentException] {
      GapFill.ewma(df.withColumn("__ew_out", lit(1)), "k", "t", "v", 0.5)
    }
    assert(e2.getMessage.contains("__ew_out"))
  }
}
