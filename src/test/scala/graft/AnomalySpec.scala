package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Anomaly

class AnomalySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("trailingZscores flags a spike against a noisy history") {
    // 12 buckets alternating 9/11 (mean 10, pop var 1), then a 100-spike
    val series = ((0 until 12).map(h =>
      ("a", ts(h), if (h % 2 == 0) 9L else 11L)) :+ (("a", ts(12), 100L)))
      .toDF("k", "bucket", "cnt")
    val out = rows(Anomaly.trailingZscores(series, "k", "bucket", "cnt",
      window = 24, minPrior = 12, threshold = 3.0).orderBy(col("bucket")))
    // first 12 buckets: not enough history -> NULL z, never flagged
    out.take(12).foreach { r =>
      assert(r.isNullAt(4) && !r.getBoolean(5), s"warmup row flagged: $r")
    }
    val spike = out.last
    assert(spike.getDouble(3) === 10.0)  // trailing mean
    assert(spike.getDouble(4) === 90.0)  // (100 - 10) / 1
    assert(spike.getBoolean(5))
  }

  test("flat history reads NULL z and never flags (sigma undefined)") {
    val series = ((0 until 12).map(h => ("a", ts(h), 10L))
      :+ (("a", ts(12), 100L))).toDF("k", "bucket", "cnt")
    val last = rows(Anomaly.trailingZscores(series, "k", "bucket", "cnt",
      window = 24, minPrior = 12, threshold = 3.0)
      .orderBy(col("bucket"))).last
    assert(last.getDouble(3) === 10.0)
    assert(last.isNullAt(4) && !last.getBoolean(5))
  }

  test("frame is retrospective: the spike does not inflate its own sigma") {
    // window 3: bucket 4's stats come from buckets 1-3 only
    val series = Seq(("a", ts(1), 10L), ("a", ts(2), 12L), ("a", ts(3), 8L),
      ("a", ts(4), 50L)).toDF("k", "bucket", "cnt")
    val out = rows(Anomaly.trailingZscores(series, "k", "bucket", "cnt",
      window = 3, minPrior = 3, threshold = 3.0).orderBy(col("bucket")))
    assert(out.last.getDouble(3) === 10.0) // mean of 10,12,8 — not of 50
    assert(out.last.getBoolean(5))
    intercept[IllegalArgumentException] {
      Anomaly.trailingZscores(series.withColumn("z", lit(1)),
        "k", "bucket", "cnt", 3, 3, 3.0)
    }
  }
}
