package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side replay of the operator's exact quantized recurrence. */
  private def reference(
      edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val vts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var rank = vts.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val s = edges.groupBy(_._2).view.mapValues { es =>
        // exact decimal sum of 6dp contributions
        es.map(e => BigDecimal(r6(rank(e._1) / out(e._1))))
          .sum.toDouble
      }.toMap
      rank = vts.map(v => v -> r6((1.0 - d) + d * s.getOrElse(v, 0.0))).toMap
    }
    rank
  }

  test("ranks match the quantized recurrence on a directed graph with a sink") {
    // 1 -> 2, 1 -> 3, 2 -> 3, 4 isolated-ish (only out-edge), 3 is a sink
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L))
    val df = edges.toDF("src", "dst")
    for (iters <- Seq(1, 2, 3)) {
      val got = rows(PageRank.ranks(df, iters))
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = reference(edges, iters, 0.85)
      assert(got === want, s"iters=$iters")
    }
  }

  test("no-in-edge vertices settle at 1-d; hub accumulates the most rank") {
    // star: everyone points at 1
    val star = (2L to 6L).map(_ -> 1L)
    val got = rows(PageRank.ranks(star.toDF("src", "dst"), 2))
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (2L to 6L).foreach(v => assert(got(v) === 0.15))
    assert(got(1L) > got(2L))
    assert(got(1L) === reference(star, 2, 0.85)(1L))
  }

  test("symmetrize emits both directions exactly once") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 2L)).toDF("a", "b")
    val e = rows(PageRank.symmetrize(pairs, "a", "b"))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e === Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }
}
