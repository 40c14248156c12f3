package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def points = Seq(
    (1L, 0L), (2L, 5L), (3L, 14L), (4L, 15L), (5L, 27L), (6L, -3L)
  ).toDF("pid", "p")

  private def intervals = Seq(
    (10L, 0L, 13L),   // [0,13]: pids 1,2
    (11L, 14L, 27L),  // [14,27]: pids 3,4,5
    (12L, 5L, 5L),    // degenerate single-value: pid 2
    (13L, -10L, -1L), // negative domain: pid 6
    (14L, 20L, 10L)   // inverted — matches nothing
  ).toDF("iid", "s", "e")

  private def naive = points.join(intervals,
      col("p") >= col("s") && col("p") <= col("e"))
    .select("pid", "iid")

  test("binned join equals the naive predicate join, no duplicate pairs") {
    for (w <- Seq(1L, 3L, 14L, 100L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select("pid", "iid")
      val g = rows(got).map(r => (r.getLong(0), r.getLong(1)))
      val n = rows(naive).map(r => (r.getLong(0), r.getLong(1)))
      assert(g.sorted === n.sorted, s"binWidth=$w")
      assert(g.distinct.size === g.size, s"binWidth=$w emitted duplicate pairs")
    }
  }

  test("Long.MinValue sentinel points bin without overflow and match nothing") {
    import spark.implicits._
    // v - pmod(v, w) in LONG underflowed for v near Long.MinValue —
    // an ANSI ARITHMETIC_OVERFLOW that killed the whole join where the
    // predicate join would simply not match the sentinel row
    val pts = Seq(1L -> 3L, 2L -> Long.MinValue, 3L -> Long.MaxValue)
      .toDF("pid", "p")
    val ivs = Seq(10L -> (0L, 5L)).map { case (i, (s, e)) => (i, s, e) }
      .toDF("iid", "s", "e")
    val got = rows(RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", 86400L)
      .select("pid", "iid")).map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Seq((1L, 10L)), "sentinel extremes match nothing, job survives")
  }

  test("closed-interval boundaries are inclusive on both ends") {
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 7L)
    val pairs = rows(got.select("pid", "iid")).map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 10L))) // p=0 at start bound
    assert(pairs.contains((5L, 11L))) // p=27 at end bound
    assert(pairs.contains((2L, 12L))) // degenerate [5,5]
  }

  test("reserved bin column collision fails fast") {
    val bad = points.withColumn("__rj_bin", lit(1))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(bad, "p", intervals, "s", "e", 7L)
    }
    assert(e.getMessage.contains("__rj_bin"))
  }

  test("plans as an equi join on the bin key — no nested-loop, no cartesian") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  private def ivA = Seq(
    (1L, 0L, 20L), (2L, 5L, 9L), (3L, 30L, 40L), (4L, -8L, -2L)
  ).toDF("ka", "sa", "ea")
  private def ivB = Seq(
    (10L, 10L, 15L),  // overlaps 1 only
    (11L, 0L, 100L),  // overlaps 1, 2, 3 (and spans many bins)
    (12L, 41L, 50L),  // touches nothing (3 ends at 40... adjacent? 41 > 40 -> no)
    (13L, -5L, 1L)    // overlaps 4 and 1
  ).toDF("kb", "sb", "eb")

  test("intervalOverlap equals the naive overlap join, each pair exactly once") {
    val naive = rows(ivA.join(ivB,
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("ka", "kb")).map(r => (r.getLong(0), r.getLong(1))).sorted
    for (w <- Seq(1L, 4L, 14L, 1000L)) {
      val got = rows(RangeJoin.intervalOverlap(ivA, "sa", "ea", ivB, "sb", "eb", w)
        .select("ka", "kb")).map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sorted === naive, s"binWidth=$w")
      assert(got.distinct.size === got.size, s"binWidth=$w emitted duplicates")
    }
  }

  test("intervalOverlap boundary semantics: closed ends touch, adjacency does not") {
    val a = Seq((1L, 0L, 10L)).toDF("ka", "sa", "ea")
    val touch = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("kb", "sb", "eb")
    val got = rows(RangeJoin.intervalOverlap(a, "sa", "ea", touch, "sb", "eb", 5L)
      .select("kb")).map(_.getLong(0))
    assert(got === Seq(2L)) // [10,20] touches at 10; [11,20] is adjacent only
  }

  test("intervalOverlap requires disjoint column names") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(ivA, "sa", "ea",
        ivA.withColumnRenamed("ka", "kb"), "sa", "ea", 5L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("mergeIntervals collapses overlap and touch, keeps gaps, per key") {
    val df = Seq(
      ("A", 1L, 5L), ("A", 4L, 8L),   // overlap -> [1,8]
      ("A", 8L, 9L),                  // touch (closed) -> [1,9]
      ("A", 11L, 12L),                // gap -> own island
      ("B", 2L, 3L),                  // other key untouched
      ("A", 2L, 3L)                   // contained -> absorbed in [1,9]
    ).toDF("k", "s", "e").repartition(4)
    val out = rows(RangeJoin.mergeIntervals(df, "k", "s", "e")
      .orderBy(col("k"), col("island_start")))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq(
      ("A", 1L, 9L, 4L), ("A", 11L, 12L, 1L), ("B", 2L, 3L, 1L)))
  }

  test("mergeIntervals: a later-starting but longer interval extends the running max") {
    // [1,10] then [2,3] then [4,12]: naive lag(end) would break at 4>3,
    // but the running MAX(end) keeps one island through 12.
    val df = Seq(("A", 1L, 10L), ("A", 2L, 3L), ("A", 4L, 12L)).toDF("k", "s", "e")
    val out = rows(RangeJoin.mergeIntervals(df, "k", "s", "e"))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq((1L, 12L, 3L)))
  }

  test("mergeIntervals fails fast when an input column collides with an OUTPUT name") {
    import spark.implicits._
    // chaining a second merge over a prior output (key = island_start)
    // would otherwise emit two same-named columns and die downstream
    // in AMBIGUOUS_REFERENCE
    val prior = Seq(("a", 1L, 5L)).toDF("island_start", "s", "e")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.mergeIntervals(prior, "island_start", "s", "e")
    }
    assert(ex.getMessage.contains("island_start"))
  }

  test("mergeIntervals drops inverted intervals and fails fast on reserved names") {
    val df = Seq(("A", 5L, 1L), ("A", 2L, 4L)).toDF("k", "s", "e")
    val out = rows(RangeJoin.mergeIntervals(df, "k", "s", "e"))
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out === Seq((2L, 4L)))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.mergeIntervals(df.withColumn("__mi_island", lit(1)), "k", "s", "e")
    }
    assert(e.getMessage.contains("__mi_island"))
  }
}
