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
}
