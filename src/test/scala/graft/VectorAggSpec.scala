package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorAgg

class VectorAggSpec extends SparkTestBase {
  import spark.implicits._

  test("standardizeDims: z-scores match the hand-computed per-dimension moments") {
    // dim 0: values 1,3 -> mean 2, var 1, std 1; dim 1: 2,2 -> std 0.
    val df = Seq((1L, Array(1f, 2f)), (2L, Array(3f, 2f))).toDF("id", "vec")
    val out = rows(VectorAgg.standardizeDims(df, "id", "vec")
      .orderBy(col("vec_id"), col("pos")))
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out === Seq(
      (1L, 0, -1.0), (1L, 1, null), // constant dim -> NULL, not an ANSI error
      (2L, 0, 1.0), (2L, 1, null)))
  }

  test("meanVectors: NULL elements are absent values, never zeros") {
    // group g, pos 0: values 2.0 and NULL — the mean is 2.0 (one
    // present value), not 1.0 (NULL averaged as zero)
    val df = spark.sql(
      """SELECT * FROM VALUES
        | ('g', array(CAST(2.0 AS FLOAT))),
        | ('g', array(CAST(NULL AS FLOAT)))
        |AS t(grp, vec)""".stripMargin)
    val out = rows(VectorAgg.meanVectors(df, "grp", "vec"))
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getFloat(3)))
    assert(out === Seq(("g", 2L, 0, 2.0f)),
      "n_vecs counts vectors seen; comp averages only present elements")
  }

  test("standardizeDims: standardized column has mean ~0 and std ~1 per dimension") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 50L).map(i => (i, Array.fill(4)(rnd.nextFloat() * 10f)))
      .toDF("id", "vec").repartition(5)
    val z = VectorAgg.standardizeDims(df, "id", "vec")
    val stats = rows(z.groupBy(col("pos"))
      .agg(avg(col("z")).as("m"), stddev_pop(col("z")).as("s"))
      .orderBy(col("pos")))
      .map(r => (r.getDouble(1), r.getDouble(2)))
    stats.foreach { case (m, s) =>
      assert(math.abs(m) < 1e-6, s"mean $m not ~0")
      assert(math.abs(s - 1.0) < 1e-6, s"std $s not ~1")
    }
  }

  test("standardizeDims is partition-layout independent (exact decimal moments)") {
    val rnd = new scala.util.Random(11)
    val base = (1L to 30L).map(i => (i, Array.fill(3)(rnd.nextFloat())))
    val a = rows(VectorAgg.standardizeDims(
      base.toDF("id", "vec").repartition(1), "id", "vec")
      .orderBy(col("vec_id"), col("pos"))).map(_.getDouble(2))
    val b = rows(VectorAgg.standardizeDims(
      base.toDF("id", "vec").repartition(7), "id", "vec")
      .orderBy(col("vec_id"), col("pos"))).map(_.getDouble(2))
    assert(a === b)
  }
  test("clusterSeparation: separated clusters score positive, lone label NULL") {
    val df = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.9f, 0.1f)),
      (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.1f, 0.9f)))
      .toDF("vec_id", "label", "vec")
    val r = rows(VectorAgg.clusterSeparation(df, "vec_id", "label", "vec")
      .orderBy(col("label")))
    assert(r.map(_.getInt(0)) === Seq(0, 1))
    r.foreach { row =>
      assert(row.getLong(1) === 2L)
      assert(row.getDouble(2) > 0.99, s"own-cluster cohesion: $row")
      assert(row.getDouble(4) > 0.8, s"separation: $row")
    }
    // one label: no rival centroid -> NULL mean_other and separation
    val lone = rows(VectorAgg.clusterSeparation(
      df.filter(col("label") === 0), "vec_id", "label", "vec")).head
    assert(!lone.isNullAt(2) && lone.isNullAt(3) && lone.isNullAt(4))
  }

  test("clusterSeparation: a degenerate member counts in n_vecs but never in the means") {
    // a zero-norm member scores guardCos's -2.0 sentinel against every
    // centroid — averaging that impossible cosine would shift the
    // 3-member label's mean_own_cos by ~-1 and corrupt the report
    val df = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.9f, 0.1f)),
      (5L, 0, Array(0.0f, 0.0f)), // zero-norm: unmeasurable member
      (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.1f, 0.9f)))
      .toDF("vec_id", "label", "vec")
    val r = rows(VectorAgg.clusterSeparation(df, "vec_id", "label", "vec")
      .orderBy(col("label"))).head
    assert(r.getLong(1) === 3L, "degenerate member still counts in n_vecs")
    assert(r.getDouble(2) > 0.9,
      s"mean_own_cos must exclude the -2.0 sentinel: $r")
    assert(r.getDouble(4) > 0.8, s"separation: $r")
  }
}
