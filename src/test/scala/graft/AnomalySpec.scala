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
  test("NaN/Inf leaks in a double-typed count column drop like NULL, not ANSI-kill") {
    // cast(NaN AS DECIMAL) aborts the job under ANSI — a corrupt
    // reading must cost its own row (the no-measurement semantic NULL
    // already gets), not the whole detector run
    val series = (Seq(("a", ts(1), 10.0), ("a", ts(2), 12.0), ("a", ts(3), 8.0))
      // 1e40 is FINITE but past DECIMAL(38,0)'s ceiling — the cast
      // would CAST_OVERFLOW under ANSI just like NaN/Inf
      ++ Seq(("a", ts(4), Double.NaN), ("a", ts(5), Double.PositiveInfinity),
        ("a", ts(7), 1e40))
      :+ (("a", ts(6), 50.0))).toDF("k", "bucket", "cnt")
    val out = rows(Anomaly.trailingZscores(series, "k", "bucket", "cnt",
      window = 3, minPrior = 3, threshold = 3.0).orderBy(col("bucket")))
    assert(out.size === 4, "non-finite rows are excluded, finite ones kept")
    assert(out.last.getDouble(3) === 10.0, "history = the three finite buckets")
    assert(out.last.getBoolean(5), "the spike still flags")
    val cus = rows(Anomaly.cusumChangePoints(
      Seq(("a", 1, 10.0), ("a", 2, Double.NaN), ("a", 3, 50.0))
        .toDF("k", "b", "v"), Seq("k"), "b", "v"))
    assert(cus.size === 2 && cus.count(_.getBoolean(5)) === 1)
  }

  test("finite-but-huge values cannot overflow the decimal CHAIN (x*x, n*sxx, n*cum)") {
    // 2e19 passes a single-cast bound (9e37) but x*x = 4e38 overflows
    // DECIMAL(38,0) — the r9 hole: the guard must bound the whole
    // expression chain, so the corrupt row costs itself, not the job
    val series = (Seq(("a", ts(1), 10.0), ("a", ts(2), 12.0), ("a", ts(3), 8.0))
      :+ (("a", ts(4), 2e19)) :+ (("a", ts(5), 50.0))).toDF("k", "bucket", "cnt")
    val out = rows(Anomaly.trailingZscores(series, "k", "bucket", "cnt",
      window = 3, minPrior = 3, threshold = 3.0).orderBy(col("bucket")))
    assert(out.size === 4, "the 2e19 row is excluded, the job survives")
    assert(out.last.getBoolean(5), "the real spike still flags")
    val cus = rows(Anomaly.cusumChangePoints(
      Seq(("a", 1, 10.0), ("a", 2, 2e19), ("a", 3, 50.0))
        .toDF("k", "b", "v"), Seq("k"), "b", "v"))
    assert(cus.size === 2 && cus.count(_.getBoolean(5)) === 1)
  }

  test("cusumChangePoints pins the regime boundary; per-key peaks independent") {
    import spark.implicits._
    // 10 days at 10, then 10 days at 50: |cusum| maximal at the last
    // low day (t=10)
    val series = ((1 to 10).map(d => ("a", d, 10L))
      ++ (11 to 20).map(d => ("a", d, 50L))).toDF("k", "b", "v")
    val out = rows(Anomaly.cusumChangePoints(series, Seq("k"), "b", "v")
      .orderBy(col("b")))
    val peaks = out.filter(_.getBoolean(5))
    assert(peaks.size === 1 && peaks.head.getInt(3) === 10)
    // flat series: cusum identically 0, earliest bucket flagged (tie rule)
    val flat = (1 to 5).map(d => ("a", d, 7L)).toDF("k", "b", "v")
    val f = rows(Anomaly.cusumChangePoints(flat, Seq("k"), "b", "v")
      .orderBy(col("b")))
    assert(f.forall(_.getLong(4) === 0L))
    assert(f.count(_.getBoolean(5)) === 1 && f.head.getBoolean(5))
    // two keys: each gets its own peak
    val two = (series.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      ++ (1 to 10).map(d => ("z", d, if (d <= 3) 100L else 1L)))
      .toSeq.toDF("k", "b", "v")
    val t2 = rows(Anomaly.cusumChangePoints(two, Seq("k"), "b", "v"))
    assert(t2.filter(_.getBoolean(5)).map(_.getString(0)).toSet === Set("a", "z"))
    // NULL values are filtered at entry: t and the sums stay aligned,
    // so a planted null neither shifts the peak nor appears in output
    val withNull = (series.collect()
      .map(r => (r.getString(0), r.getInt(1), java.lang.Long.valueOf(r.getLong(2))))
      :+ (("a", 5, null: java.lang.Long))).toSeq.toDF("k", "b", "v")
    val n = rows(Anomaly.cusumChangePoints(withNull, Seq("k"), "b", "v")
      .orderBy(col("b")))
    assert(n.size === 20 && n.forall(!_.isNullAt(2)))
    val nPeaks = n.filter(_.getBoolean(5))
    assert(nPeaks.size === 1 && nPeaks.head.getInt(3) === 10)
  }
}
