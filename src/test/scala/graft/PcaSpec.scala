package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

class PcaSpec extends SparkTestBase {

  private def corpus(vs: Seq[Array[Float]]) = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "vec")
      .selectExpr("id", "cast(vec as array<float>) as vec")
  }

  test("topComponent recovers a planted dominant direction, unit norm, fixed sign") {
    // variance concentrated on axis 2 (mixed signs), noise on axis 0
    val vs = Seq(
      Array(0.1f, 0f, 10f, 0f), Array(-0.1f, 0f, -10f, 0f),
      Array(0.05f, 0f, 9f, 0f), Array(-0.05f, 0f, -11f, 0f))
    val out = rows(Pca.topComponent(corpus(vs), dim = 4, iters = 4)
      .orderBy(col("d"))).map(r => (r.getInt(0), r.getDouble(1)))
    val comp = out.map(_._2)
    assert(out.map(_._1) === Seq(0, 1, 2, 3))
    // dominant axis carries nearly all weight
    assert(math.abs(comp(2)) > 0.99, comp.mkString(","))
    // unit norm within rounding
    assert(math.abs(comp.map(x => x * x).sum - 1.0) < 1e-4)
    // sign fix: the lowest-numbered nonzero component is positive
    assert(comp.find(_ != 0.0).get > 0.0)
  }

  test("topComponent is deterministic across runs and partitionings") {
    val vs = (0 until 40).map { i =>
      Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat)
    }
    val a = rows(Pca.topComponent(corpus(vs), 8, 3).orderBy(col("d")))
      .map(_.getDouble(1))
    val b = rows(Pca.topComponent(corpus(vs).repartition(7), 8, 3)
      .orderBy(col("d"))).map(_.getDouble(1))
    assert(a === b, "result must not depend on partitioning")
  }

  test("topComponent's probe names a NULL vec instead of an opaque NPE") {
    // all-null corpus forces limit(1) to sample the null row (with a
    // mixed corpus the probe's outcome depended on which row the
    // sample picked; the contract for slipped-past rows is documented
    // at the probe, same as mixed dimensions)
    val nulls = spark.sql(
      "SELECT 1L AS id, CAST(NULL AS ARRAY<FLOAT>) AS vec")
    val e = intercept[IllegalArgumentException] {
      Pca.topComponent(nulls, 3, 2).collect()
    }
    assert(e.getMessage.contains("NULL vec"))
  }

  test("topComponent fails fast when the iterate collapses to zero") {
    // corpus orthogonal to e_0 AND with zero Gram action on it:
    // all-zero first coordinate makes u = 0 for every row
    val vs = Seq(Array(0f, 1f, 0f), Array(0f, 0f, 1f))
    val e = intercept[IllegalArgumentException] {
      Pca.topComponent(corpus(vs), 3, 2).collect()
    }
    assert(e.getMessage.contains("collapsed"))
  }
}
