package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

class TrianglesSpec extends SparkTestBase {

  test("K4: every wedge closes — cc = 1.0") {
    import spark.implicits._
    val e = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
      .toDF("src", "dst")
    val r = rows(Triangles.triangleStats(e, "src", "dst")).head
    assert(r.getLong(0) === 4L)   // nodes
    assert(r.getLong(1) === 6L)   // edges
    assert(r.getLong(2) === 12L)  // wedges: 4 * C(3,2)
    assert(r.getLong(3) === 4L)   // triangles: C(4,3)
    assert(r.getDouble(4) === 1.0)
  }

  test("star: wedges but no triangles — cc = 0") {
    import spark.implicits._
    val e = Seq((0, 1), (0, 2), (0, 3), (0, 4)).toDF("src", "dst")
    val r = rows(Triangles.triangleStats(e, "src", "dst")).head
    assert(r.getLong(2) === 6L)  // C(4,2) at the hub
    assert(r.getLong(3) === 0L)
    assert(r.getDouble(4) === 0.0)
  }

  test("canonicalization: duplicates, reversals, self-loops collapse") {
    import spark.implicits._
    // triangle 1-2-3 written messily: both directions, repeats, a loop
    val e = Seq((1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 3), (2, 2))
      .toDF("src", "dst")
    val r = rows(Triangles.triangleStats(e, "src", "dst")).head
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getLong(3) === 1L)
    assert(r.getDouble(4) === 1.0)
  }

  test("orientation counts each triangle once on a graph with a hub") {
    import spark.implicits._
    // hub 0 touches everyone; triangles: (0,1,2), (0,3,4), (0,1,5),
    // (0,2,5), (1,2,5)
    val e = Seq((0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
      (1, 2), (3, 4), (1, 5), (2, 5)).toDF("src", "dst")
    val r = rows(Triangles.triangleStats(e, "src", "dst")).head
    assert(r.getLong(3) === 5L)
  }

  test("edgeless and wedgeless inputs degrade gracefully") {
    import spark.implicits._
    val single = Seq((1, 2)).toDF("src", "dst")
    val r = rows(Triangles.triangleStats(single, "src", "dst")).head
    assert(r.getLong(1) === 1L && r.getLong(2) === 0L && r.getLong(3) === 0L)
    assert(r.isNullAt(4)) // 0 wedges -> NULL cc, not a division error
  }
  test("randomized sparse graphs match a brute-force triangle count") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 6) {
      val n = 8 + rnd.nextInt(18)
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextDouble() < 0.25
      } yield (a, b)).toVector
      if (edges.nonEmpty) {
        val eset = edges.toSet
        val brute = (for {
          a <- 0 until n; b <- (a + 1) until n; c <- (b + 1) until n
          if eset((a, b)) && eset((b, c)) && eset((a, c))
        } yield 1).size.toLong
        val got = rows(Triangles.triangleStats(
          edges.toDF("src", "dst"), "src", "dst")).head.getLong(3)
        assert(got === brute, s"trial $trial: n=$n m=${edges.size}")
      }
    }
  }
}
