package graft

import org.apache.spark.sql.functions._

import graft.operators.Geo

class GeoSpec extends SparkTestBase {
  import spark.implicits._

  private def nearest(
      probes: Seq[(Long, Double, Double)], cands: Seq[(Long, Double, Double)],
      r: Double): Seq[(Long, Long, Double)] =
    rows(Geo.nearestWithinRadius(
      probes.toDF("pid", "px", "py").repartition(3), "pid", "px", "py",
      cands.toDF("cid", "cx", "cy").repartition(2), "cid", "cx", "cy", r)
      .orderBy(col("pid")))
      .map(x => (x.getLong(0), x.getLong(3), x.getDouble(4)))

  test("matches the naive all-pairs result on a random planar set") {
    val rnd = new scala.util.Random(5)
    val probes = (1L to 60L).map(i => (i, rnd.nextDouble() * 50, rnd.nextDouble() * 50))
    val cands = (1L to 40L).map(i => (i, rnd.nextDouble() * 50, rnd.nextDouble() * 50))
    val r = 6.0
    val naive = probes.flatMap { case (pid, px, py) =>
      val within = cands.map { case (cid, cx, cy) =>
        (cid, (px - cx) * (px - cx) + (py - cy) * (py - cy))
      }.filter(_._2 <= r * r)
      if (within.isEmpty) None
      else {
        val (cid, d) = within.minBy { case (cid, d) => (d, cid) }
        Some((pid, cid, d))
      }
    }
    assert(nearest(probes, cands, r) === naive)
  }

  test("a candidate just outside the radius is excluded; just inside is kept") {
    val probes = Seq((1L, 0.0, 0.0))
    val cands = Seq((10L, 3.0, 4.0), (20L, 5.0, 0.125))
    // |(3,4)| = 5 exactly: kept at r=5 (closed ball). |(5,0.125)| > 5.
    assert(nearest(probes, cands, 5.0) === Seq((1L, 10L, 25.0)))
  }

  test("neighbor-cell candidates are found across cell boundaries") {
    // probe at the very edge of its cell; candidate sits in the next
    // cell over but within the radius.
    val probes = Seq((1L, 9.9, 0.0))
    val cands = Seq((7L, 10.1, 0.0))
    val d = 9.9 - 10.1
    assert(nearest(probes, cands, 10.0) === Seq((1L, 7L, d * d)))
  }

  test("distance ties break to the lowest candidate id") {
    val probes = Seq((1L, 0.0, 0.0))
    val cands = Seq((30L, 1.0, 0.0), (20L, -1.0, 0.0))
    assert(nearest(probes, cands, 2.0) === Seq((1L, 20L, 1.0)))
  }

  test("NULL candidate ids are excluded — they would win every distance tie") {
    // NULL sorts first in min(struct(dist_sq, candId)): a keyless
    // candidate at the same distance as a real one used to make the
    // probe report nearest = NULL
    val probes = Seq((1L, 0.0, 0.0)).toDF("pid", "px", "py")
    val cands = spark.sql(
      """SELECT * FROM VALUES (CAST(NULL AS LONG), 1.0D, 0.0D),
        | (20L, -1.0D, 0.0D) AS t(cid, cx, cy)""".stripMargin)
    val out = rows(Geo.nearestWithinRadius(
      probes, "pid", "px", "py", cands, "cid", "cx", "cy", 2.0))
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out === Seq((1L, 20L)))
  }

  test("probes with no candidate in range emit nothing; negative coords work") {
    val probes = Seq((1L, -20.0, -20.0), (2L, -1.0, -1.0))
    val cands = Seq((5L, -1.5, -1.5))
    val got = nearest(probes, cands, 1.0)
    assert(got === Seq((2L, 5L, 0.5)))
  }

  test("NULL coordinates are excluded, not hot-keyed onto one (null,null) cell") {
    // struct join keys treat null fields as EQUAL: unfiltered, every
    // NULL-coord probe (x9 cells) met every NULL-coord candidate on a
    // single hot key — a silent O(nullP*9*nullC) blowup
    val probes = Seq((1L, Some(0.0), Some(0.0)),
      (2L, None: Option[Double], Some(1.0)), (3L, None: Option[Double], None))
      .toDF("pid", "px", "py")
    val cands = Seq((5L, Some(0.1), Some(0.0)),
      (6L, None: Option[Double], None: Option[Double]))
      .toDF("cid", "cx", "cy")
    val got = rows(Geo.nearestWithinRadius(
      probes, "pid", "px", "py", cands, "cid", "cx", "cy", 1.0))
      .map(x => (x.getLong(0), x.getLong(3)))
    assert(got === Seq((1L, 5L)))
  }

  test("NaN/Infinity coordinates are excluded like NULL, not cell (0,0) / ANSI-killed") {
    // floor(NaN).cast(long) is SILENTLY 0: an unfiltered NaN-coord row
    // on each side would meet on the (0,0) cell — the NULL hot-key
    // blowup one cell over. And cast(Inf AS LONG) under ANSI ABORTS
    // the job mid-scan; both must be excluded up front, with real
    // probes near the origin cell still matching normally.
    val probes = Seq((1L, 0.0, 0.0), (2L, Double.NaN, 0.0),
      (3L, Double.PositiveInfinity, 1.0),
      // finite but past Long range in cell units: the ANSI long cast
      // of floor(1e300 / radius) would abort the job unfiltered
      (4L, 1e300, 1.0)).toDF("pid", "px", "py")
    val cands = Seq((5L, 0.1, 0.0), (6L, Double.NaN, Double.NaN),
      (7L, 0.2, Double.NegativeInfinity),
      (8L, -1e300, 0.3)).toDF("cid", "cx", "cy")
    val got = rows(Geo.nearestWithinRadius(
      probes, "pid", "px", "py", cands, "cid", "cx", "cy", 1.0))
      .map(x => (x.getLong(0), x.getLong(3)))
    assert(got === Seq((1L, 5L)))
  }

  test("fails fast when an input column is named dist_sq (reserved output)") {
    import spark.implicits._
    val probes = Seq((1L, 0.0, 0.0)).toDF("pid", "px", "dist_sq")
    val cands = Seq((5L, 0.5, 0.5)).toDF("cid", "cx", "cy")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Geo.nearestWithinRadius(
        probes, "pid", "px", "dist_sq", cands, "cid", "cx", "cy", 2.0)
    }
    assert(e.getMessage.contains("dist_sq"))
  }
}
