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

  test("build is a single partial-combined aggregate; estimate broadcasts the sketch") {
    val cms = Sketch.cmsBuild(corpus, "k", 4, 64)
    val plan = planString(Sketch.cmsEstimate(cms, corpus, "k", 4, 64))
    assert(plan.contains("BroadcastHashJoin"), s"sketch side not broadcast:\n$plan")
  }
}
