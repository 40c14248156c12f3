package graft

import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}

class KMeansSpec extends SparkTestBase {

  private def toDf(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("id", "vec")
  }

  // Two well-separated direction clusters with one seed (lowest ids)
  // landing in each: ids 0,2,4 hug the x-axis, ids 1,3,5 the y-axis.
  private val twoClusters = toDf(Seq(
    0L -> Array(1.0f, 0.1f), 1L -> Array(0.1f, 1.0f),
    2L -> Array(0.9f, 0.2f), 3L -> Array(0.2f, 0.9f),
    4L -> Array(1.1f, 0.0f), 5L -> Array(0.0f, 1.1f)))

  test("iters = 0 returns the k lowest-id seeds relabeled 0..k-1") {
    val cb = KMeans.fit(twoClusters, k = 2, iters = 0)
    assert(cb.map(_._1).toSeq === Seq(0L, 1L))
    assert(cb(0)._2.toSeq === Seq(1.0f, 0.1f))
    assert(cb(1)._2.toSeq === Seq(0.1f, 1.0f))
  }

  test("corrupt elements (null/NaN/Inf) fail fast at the assignment scan, by name") {
    import spark.implicits._
    // unguarded, a null element NULLed every dot (score -2, centroid
    // 0) then biased meanVectors' count-vs-sum; a NaN/Inf element
    // reached the update step's decimal cast and ANSI-killed the JOB
    // there, far from the corrupt row
    for (bad <- Seq(
        Seq[java.lang.Float](1.0f, null),
        Seq[java.lang.Float](Float.NaN, 0.5f),
        Seq[java.lang.Float](0.5f, Float.PositiveInfinity))) {
      val corpus = toDf(Seq(0L -> Array(1.0f, 0.1f), 1L -> Array(0.1f, 1.0f)))
        .unionByName(Seq((9L, bad)).toDF("id", "vec"))
      val e = intercept[Exception] { KMeans.fit(corpus, k = 2, iters = 1) }
      assert(e.getMessage != null &&
        (e.getMessage.contains("null/NaN/Inf") ||
          Option(e.getCause).exists(_.getMessage.contains("null/NaN/Inf"))),
        s"expected the corrupt-element message, got: ${e.getMessage}")
    }
  }

  test("a fully-NULL vector fails fast by name (size(NULL) dodged both sibling guards)") {
    import spark.implicits._
    // size(NULL) is NULL so neither the wrong-dim nor the
    // corrupt-element branch fired — the row scored the -2 sentinel
    // and silently joined centroid 0
    val corpus = toDf(Seq(0L -> Array(1.0f, 0.1f), 1L -> Array(0.1f, 1.0f)))
      .unionByName(spark.sql(
        "SELECT 9L AS id, CAST(NULL AS ARRAY<FLOAT>) AS vec"))
    val e = intercept[Exception] { KMeans.fit(corpus, k = 2, iters = 1) }
    assert(e.getMessage != null &&
      (e.getMessage.contains("NULL vector") ||
        Option(e.getCause).exists(_.getMessage.contains("NULL vector"))),
      s"expected the NULL-vector message, got: ${e.getMessage}")
  }

  test("Lloyd iterations move centroids to their cluster means") {
    val cb = KMeans.fit(twoClusters, k = 2, iters = 2).toMap
    // cluster of centroid 0 = {0, 2, 4}: mean (1.0, 0.1)
    assert(math.abs(cb(0L)(0) - 1.0f) < 1e-5 && math.abs(cb(0L)(1) - 0.1f) < 1e-5)
    // cluster of centroid 1 = {1, 3, 5}: mean (0.1, 1.0)
    assert(math.abs(cb(1L)(0) - 0.1f) < 1e-5 && math.abs(cb(1L)(1) - 1.0f) < 1e-5)
  }

  test("training is deterministic under repartitioning") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val a = KMeans.fit(embs, k = 4, iters = 2)
    val b = KMeans.fit(embs.repartition(7), k = 4, iters = 2)
    assert(a.map(_._1).toSeq === b.map(_._1).toSeq)
    a.zip(b).foreach { case ((_, va), (_, vb)) => assert(va.toSeq === vb.toSeq) }
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // Every vector is collinear, so every cosine ties at 1.0 and the
    // lowest-cid tie-break sends ALL rows (seed 1's own included) to
    // centroid 0 — cluster 1 ends the iteration empty.
    val df = toDf(Seq(
      0L -> Array(1.0f, 0.0f), 1L -> Array(2.0f, 0.0f),
      2L -> Array(0.5f, 0.0f), 3L -> Array(3.0f, 0.0f)))
    val cb = KMeans.fit(df, k = 2, iters = 1).toMap
    assert(cb(1L).toSeq === Seq(2.0f, 0.0f)) // carried, not NaN/empty
    assert(math.abs(cb(0L)(0) - 1.625f) < 1e-6 && cb(0L)(1) === 0.0f)
  }

  test("the trained codebook plugs into ivfTopK") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    import spark.implicits._
    val cb = KMeans.fit(embs, k = 4, iters = 1)
      .map { case (cid, v) => (cid, v.toSeq) }.toSeq
      .toDF("centroid_id", "vec")
    val probes = embs.filter(col("id") < 3)
      .select(col("id").as("probe_id"), col("vec"))
    val nn = Similarity.ivfTopK(embs, probes, cb, k = 5, nProbe = 2)
    val got = rows(nn.groupBy(col("probe_id")).count())
    assert(got.size === 3 && got.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 5L))
  }
}
