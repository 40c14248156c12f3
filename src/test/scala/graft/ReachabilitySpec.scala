package graft

import org.apache.spark.sql.functions._

import graft.operators.Reachability

class ReachabilitySpec extends SparkTestBase {
  import spark.implicits._

  private def reach(edges: Seq[(Long, Long)], k: Int): Set[(Long, Long, Long)] =
    rows(Reachability.kHop(edges.toDF("src", "dst").repartition(3), k))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("chain graph: min hops along the path, bounded by maxHops") {
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(reach(chain, 3) === Set(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L),
      (1L, 3L, 2L), (2L, 4L, 2L), (3L, 5L, 2L),
      (1L, 4L, 3L), (2L, 5L, 3L)))  // (1,5) is 4 hops: excluded
  }

  test("diamond: two equal-length paths report the pair once at min hops") {
    val diamond = Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L)
    val r = reach(diamond, 2)
    assert(r.count { case (s, d, _) => s == 1L && d == 4L } === 1)
    assert(r.contains((1L, 4L, 2L)))
  }

  test("shortcut beats the long way: hop count is the MINIMUM") {
    // 1->2->3 and a direct 1->3: (1,3) must report hops=1, not 2.
    val g = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    assert(reach(g, 3).filter(_._1 == 1L) ===
      Set((1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("cycle: returns to the source at cycle length, then terminates") {
    val cycle = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val r = reach(cycle, 5) // maxHops > cycle length: frontier must drain
    assert(r.filter(_._1 == 1L) ===
      Set((1L, 2L, 1L), (1L, 3L, 2L), (1L, 1L, 3L)))
  }

  test("multi-edges and null endpoints are dropped before traversal") {
    val dirty = Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
      .union(Seq((Some(4L), None: Option[Long])).toDF("src", "dst"))
    val r = rows(Reachability.kHop(dirty, 2))
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r === Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 2L)))
  }
}
