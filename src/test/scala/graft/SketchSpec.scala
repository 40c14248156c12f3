package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch

class SketchSpec extends SparkTestBase {
  import spark.implicits._

  // Zipf-ish corpus: key k appears 200/k times — heavy hitters + tail.
  private lazy val corpus =
    (1 to 40).flatMap(k => Seq.fill(200 / k)(s"key$k")).toDF("k")

  private def estimates(depth: Int, width: Int): Map[String, Long] = {
    val cms = Sketch.cmsBuild(corpus, "k", depth, width)
    Sketch.cmsEstimate(cms, corpus, "k", depth, width)
      .as[(String, Long)].collect().toMap
  }

  private lazy val exact: Map[String, Long] =
    corpus.groupBy("k").count().as[(String, Long)].collect().toMap

  test("estimates are one-sided: est >= exact for every key, even at a colliding width") {
    val est = estimates(depth = 4, width = 16) // 40 keys into 16 columns: heavy collisions
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"CMS underestimated $k: ${est(k)} < $c")
    }
  }

  test("a wide sketch is exact on this corpus") {
    val est = estimates(depth = 4, width = 1 << 14)
    assert(est === exact)
  }

  test("sketches merge: cell-wise sum equals the sketch of the union") {
    val (a, b) = (corpus.filter(col("k") <= "key3"), corpus.filter(col("k") > "key3"))
    val merged = Sketch.cmsMerge(
        Sketch.cmsBuild(a, "k", 4, 64), Sketch.cmsBuild(b, "k", 4, 64))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.cmsBuild(corpus, "k", 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
  }

  test("unseen keys estimate 0 unless every cell collides; nulls are excluded") {
    val cms = Sketch.cmsBuild(corpus, "k", 4, 1 << 14)
    val probes = Seq("absent1", "absent2").toDF("k")
      .union(spark.sql("SELECT CAST(NULL AS STRING) AS k"))
    val est = Sketch.cmsEstimate(cms, probes, "k", 4, 1 << 14)
      .as[(String, Long)].collect().toMap
    assert(est === Map("absent1" -> 0L, "absent2" -> 0L)) // null probe dropped
  }

  test("cmsEstimate under a DEPTH MISMATCH stays a one-sided bound (no phantom 0)") {
    // build at depth 4, probe claiming depth 8: rows 4-7 exist in no
    // sketch cell — coalescing those phantom rows to 0 would estimate
    // 0 for genuinely heavy keys, inverting the >= guarantee; the
    // row-intersection keeps the min over the 4 REAL rows
    val cms = Sketch.cmsBuild(corpus, "k", 4, 1 << 14)
    val est = Sketch.cmsEstimate(cms, corpus, "k", 8, 1 << 14)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"depth-mismatch probe underestimated $k: ${est(k)} < $c")
    }
  }

  test("cmsJoinSize is one-sided and exact at a collision-free width") {
    // Second relation: key k appears 3 times for k <= 10 — true join
    // size = sum over shared keys of c_a * c_b.
    val other = (1 to 10).flatMap(k => Seq.fill(3)(s"key$k")).toDF("k")
    val exactJoin = corpus.as("a").join(other.as("b"), Seq("k")).count()
    def est(width: Int): Long = {
      val a = Sketch.cmsBuild(corpus, "k", 4, width)
      val b = Sketch.cmsBuild(other, "k", 4, width)
      Sketch.cmsJoinSize(a, b).as[Double].collect().head.toLong
    }
    assert(est(8) >= exactJoin, "inner-product estimate went below the true join size")
    assert(est(1 << 14) === exactJoin, "collision-free estimate should be exact")
  }

  test("cmsJoinSize of disjoint key spaces estimates 0 at a collision-free width") {
    val other = Seq("no1", "no2", "no3").toDF("k")
    val a = Sketch.cmsBuild(corpus, "k", 4, 1 << 14)
    val b = Sketch.cmsBuild(other, "k", 4, 1 << 14)
    assert(Sketch.cmsJoinSize(a, b).as[Double].collect().head === 0.0)
  }

  test("cmsJoinSize under a DEPTH MISMATCH stays a one-sided bound (no phantom 0)") {
    // Two sketches built at different depths share only rows 0..2; a
    // union spine let the deeper sketch's rows 3..4 contribute ip=0
    // and win the min, estimating a large real join at 0. The
    // intersect spine's min over shared rows must stay >= the truth.
    val other = (1 to 10).flatMap(k => Seq.fill(3)(s"key$k")).toDF("k")
    val exactJoin = corpus.as("a").join(other.as("b"), Seq("k")).count()
    val a = Sketch.cmsBuild(corpus, "k", 3, 1 << 14)
    val b = Sketch.cmsBuild(other, "k", 5, 1 << 14)
    val est = Sketch.cmsJoinSize(a, b).as[Double].collect().head.toLong
    assert(est >= exactJoin, s"depth-mismatch estimate $est < true $exactJoin")
  }

  test("self-join cmsJoinSize bounds sum of squared key counts") {
    val exactSelf = exact.values.map(c => c * c).sum
    val cms = Sketch.cmsBuild(corpus, "k", 4, 16)
    assert(Sketch.cmsJoinSize(cms, cms).as[Double].collect().head.toLong >= exactSelf)
    val wide = Sketch.cmsBuild(corpus, "k", 4, 1 << 14)
    assert(Sketch.cmsJoinSize(wide, wide).as[Double].collect().head.toLong === exactSelf)
  }

  test("build is a single partial-combined aggregate; estimate broadcasts the sketch") {
    val cms = Sketch.cmsBuild(corpus, "k", 4, 64)
    val plan = planString(Sketch.cmsEstimate(cms, corpus, "k", 4, 64))
    assert(plan.contains("BroadcastHashJoin"), s"sketch side not broadcast:\n$plan")
  }
}
