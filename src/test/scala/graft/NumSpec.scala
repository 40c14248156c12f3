package graft

import org.apache.spark.sql.functions._

import graft.functions.Num

/** Direct contract tests for the FloorBin bin-id expression — the hot
  * primitive of every binned range join (RangeJoin, BandJoinRewrite).
  * The join-level specs prove end-to-end behavior; this pins the
  * expression itself, because its implementation has regressed twice
  * (LONG tree: ANSI underflow at Long.MinValue; DECIMAL tree: +84% on
  * the probe side) and the current Math.floorDiv form must stay both
  * exact and codegen'd.
  */
class NumSpec extends SparkTestBase {
  import spark.implicits._

  private val edges = Seq(
    Long.MinValue, Long.MinValue + 1, -86401L, -86400L, -86399L, -1L, 0L,
    1L, 86399L, 86400L, 86401L, Long.MaxValue - 1, Long.MaxValue)

  test("floorBin equals BigInt floor division across the whole long domain's edges") {
    for (w <- Seq(1L, 3L, 86400L, Long.MaxValue)) {
      val got = edges.toDF("v")
        .select(col("v"), Num.floorBin(col("v"), w).as("bin"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      edges.foreach { v =>
        // BigInt reference: true mathematical floor(v / w), immune to
        // every long overflow/truncation mode the implementations hit
        val expect = {
          val (q, r) = (BigInt(v) / w, BigInt(v) % w)
          (if (r < 0) q - 1 else q).toLong
        }
        assert(got(v) === expect, s"v=$v w=$w")
      }
    }
  }

  test("floorBin propagates NULL and rejects non-positive widths") {
    val got = Seq[(Long, Option[Long])](1L -> Some(7L), 2L -> None)
      .toDF("id", "v")
      .select(col("id"), Num.floorBin(col("v"), 3L).as("bin"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L) === Some(2L))
    assert(got(2L) === None)
    intercept[IllegalArgumentException](Num.floorBin(col("v"), 0L))
    intercept[IllegalArgumentException](Num.floorBin(col("v"), -5L))
  }

  test("floorBin stays inside whole-stage codegen (no decimal ops in the plan)") {
    // spark.range, not a local Seq: ConvertToLocalRelation folds a
    // local-relation filter into a LocalTableScan and the plan never
    // shows codegen at all (this test's first draft proved it)
    val df = spark.range(0, 1000000)
      .select((col("id") - 500000L).as("v"))
      .filter(Num.floorBin(col("v"), 86400L) >= 0L)
    // executedPlan.toString marks a whole-stage-codegen span with the
    // "*(n)" operator prefix (it does not print the word itself): the
    // Filter carrying floor_bin must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Filter .*floor_bin""".r.findFirstIn(plan).isDefined,
      s"floor_bin's Filter is outside whole-stage codegen:\n$plan")
    val expr = df.queryExecution.optimizedPlan.toString
    assert(!expr.toLowerCase.contains("decimal"),
      s"bin math must stay in LONG (the r8 decimal form cost +84%):\n$expr")
    // and the generated path agrees with the interpreted reference on
    // a value the LONG pmod tree used to underflow on
    assert(df.count() === 500000L)
  }

  /** Driver replay of the shared-IEEE form both engines evaluate —
    * the reference portableRound6 must match bit-for-bit.
    */
  private def refRound6(x: Double): Double =
    if (x >= -Num.PortableRoundBound && x <= Num.PortableRoundBound)
      math.floor(x * 1e6 + 0.5) / 1e6
    else x

  test("portableRound6 equals the floor form everywhere, incl. the sf0.1 incident rows") {
    // the three doubles whose built-in ROUNDs diverged between engines
    // at sf0.1 (q_sample_dsir/q_embed_centroid r9 incident), plus tie,
    // negative-tie, and plain values
    val incident = Seq(1.0079725, 0.9950734999999999, 0.9942394999999999,
      0.0032135000000000001)
    val vals = incident ++ Seq(2.5e-6, -2.5e-6, -1.0079725, 0.0, -0.0,
      1.0, 123.4567894, -123.4567895, 8.9e9, 1.23456789)
    val got = vals.toDF("x")
      .select(col("x"), Num.portableRound6(col("x")).as("r"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    vals.foreach { v =>
      assert(java.lang.Double.doubleToRawLongBits(got(v)) ===
        java.lang.Double.doubleToRawLongBits(refRound6(v) + 0.0),
        s"portableRound6($v) = ${got(v)}, reference ${refRound6(v)}")
    }
    // the incident values land on the DuckDB side of the old split
    // (the floor form), proving both engines now take the same branch
    assert(got(1.0079725) === 1.007972)
    assert(got(0.9950734999999999) === 0.995074)
    assert(got(0.9942394999999999) === 0.99424)
  }

  test("portableRound6 passes NULL/NaN/Inf/over-bound through, never an ANSI error") {
    val df = Seq[java.lang.Double](null, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity, 1e300,
      -1e300, Num.PortableRoundBound * 2).toDF("x")
      .select(Num.portableRound6(col("x")).as("r"))
    val out = df.collect().map(r =>
      if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) == null)
    assert(out(1).asInstanceOf[Double].isNaN)
    assert(out(2) === Double.PositiveInfinity)
    assert(out(3) === Double.NegativeInfinity)
    assert(out(4) === 1e300)
    assert(out(5) === -1e300)
    assert(out(6) === Num.PortableRoundBound * 2)
  }

  test("portableRound6Sql mirrors the Column form structurally") {
    val frag = Num.portableRound6Sql("m")
    // the lockstep contract: same guard bound, same scaled-floor chain
    assert(frag.contains("BETWEEN -9e9 AND 9e9"))
    assert(frag.contains("FLOOR((m) * 1e6 + 0.5) / 1e6"))
    assert(frag.contains("ELSE (m)"))
  }

  test("portableRound at 4 places pins the q_window_movavg tie class") {
    def ref4(x: Double): Double =
      if (x >= -Num.PortableRoundBound && x <= Num.PortableRoundBound)
        math.floor(x * 1e4 + 0.5) / 1e4
      else x
    // the hot shape at 4 places: a 2dp-grid sum over small counts —
    // odd-cents / 8 sits EXACTLY on a .5e-4 boundary (e.g. 1.00044 /
    // 8 = 0.12505500...), where the built-in ROUNDs may tie-diverge
    val vals = Seq(1.00044 / 8, 3.00012 / 8, -1.00044 / 8, 0.12345,
      0.00005, -0.00005, 123.45675, 8.9e9, 0.0)
    val got = vals.toDF("x")
      .select(col("x"), Num.portableRound(col("x"), 4).as("r"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    vals.foreach { v =>
      assert(java.lang.Double.doubleToRawLongBits(got(v)) ===
        java.lang.Double.doubleToRawLongBits(ref4(v) + 0.0),
        s"portableRound($v, 4) = ${got(v)}, reference ${ref4(v)}")
    }
    // and the SQL fragment renders the SAME scale literal and bound
    val frag = Num.portableRoundSql("m", 4)
    assert(frag.contains("BETWEEN -9e9 AND 9e9"))
    assert(frag.contains("FLOOR((m) * 1e4 + 0.5) / 1e4"))
    // scale range is guarded on both renderers
    intercept[IllegalArgumentException](Num.portableRound(col("x"), 0))
    intercept[IllegalArgumentException](Num.portableRoundSql("m", 7))
  }
}
