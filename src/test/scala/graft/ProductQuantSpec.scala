package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.ProductQuant

class ProductQuantSpec extends SparkTestBase {
  import spark.implicits._

  // dim 8 = 2 subspaces x 4; ids 0 and 1 are the k=2 seeds (iters=0
  // keeps the codebook AT the seeds, so approximation error is fully
  // under the test's control).
  private val seedA = Array(1f, 0f, 0f, 0f)
  private val seedB = Array(0f, 2f, 0f, 0f)
  private val seedC = Array(0f, 0f, 3f, 0f)
  private val seedD = Array(0f, 0f, 0f, 4f)
  private lazy val corpus = Seq(
    (0L, seedA ++ seedC), (1L, seedB ++ seedD),
    (2L, seedA ++ seedD), (3L, seedB ++ seedC) // recombinations of seed subvectors
  ).toDF("id", "vec")

  private lazy val cb =
    ProductQuant.fit(corpus, "id", "vec", m = 2, subDim = 4, k = 2, iters = 0)

  test("codebooks: one per subspace, k centroids each, seeded from lowest ids") {
    assert(cb.m === 2 && cb.k === 2 && cb.subDim === 4)
    assert(cb.books(0).map(_._1).toSeq === Seq(0L, 1L))
    assert(cb.books(0)(0)._2.toSeq === seedA.toSeq) // subspace 0 of id 0
    assert(cb.books(1)(1)._2.toSeq === seedD.toSeq) // subspace 1 of id 1
  }

  test("encode assigns each subvector its cosine-nearest centroid and the exact norm") {
    val enc = rows(ProductQuant.encode(corpus, "id", "vec", cb)
      .orderBy(col("id"), col("subspace")))
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    // id 2 = seedA ++ seedD: subspace 0 -> centroid 0, subspace 1 -> centroid 1
    assert(enc === Seq(
      (0L, 0, 0L), (0L, 1, 0L), (1L, 0, 1L), (1L, 1, 1L),
      (2L, 0, 0L), (2L, 1, 1L), (3L, 0, 1L), (3L, 1, 0L)))
    val norms = rows(ProductQuant.encode(corpus, "id", "vec", cb)
      .select(col("id"), col("vec_norm")).distinct().orderBy(col("id")))
      .map(_.getDouble(1))
    assert(norms(0) === math.sqrt(1.0 + 9.0)) // |seedA ++ seedC|
    assert(norms(1) === math.sqrt(4.0 + 16.0))
  }

  test("ADC scores are exact when subvectors sit ON the codebook; top-k matches exact cosine") {
    val enc = ProductQuant.encode(corpus, "id", "vec", cb)
    val probesDf = corpus.filter(col("id") === 2L)
      .select(col("id").as("probe_id"), col("vec"))
    val got = rows(ProductQuant.adcTopK(enc, probesDf, "probe_id", "vec", cb, kNN = 4)
      .orderBy(col("pq_score").desc, col("neighbor_id")))
      .map(r => (r.getLong(1), r.getDouble(2)))
    // Exact cosines of id2 = (A,D) vs each: reconstruction is lossless
    // here, so pq_score must equal round(cos, 6).
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = Map(0L -> (seedA ++ seedC), 1L -> (seedB ++ seedD),
      2L -> (seedA ++ seedD), 3L -> (seedB ++ seedC))
    val expect = vecs.map { case (id, v) =>
      id -> BigDecimal(cos(vecs(2L), v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-9, s"id=$id got=$s want=${expect(id)}")
    }
    assert(got.head._1 === 2L) // self is the top hit
  }

  test("an all-zero vector encodes to code 0 everywhere and ranks worst under ADC") {
    val withZero = corpus.union(Seq((9L, Array.fill(8)(0f))).toDF("id", "vec"))
    val enc = ProductQuant.encode(withZero, "id", "vec", cb)
    val zcodes = rows(enc.filter(col("id") === 9L).orderBy(col("subspace")))
      .map(_.getLong(3))
    assert(zcodes === Seq(0L, 0L)) // degenerate ties -> lowest centroid id
    val probesDf = corpus.filter(col("id") === 0L)
      .select(col("id").as("probe_id"), col("vec"))
    val ranked = rows(ProductQuant.adcTopK(enc, probesDf, "probe_id", "vec", cb, 5)
      .orderBy(col("pq_score").desc, col("neighbor_id")))
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(ranked.last._1 === 9L)
    assert(ranked.last._2 === VectorOps.DegenerateCos)
  }

  test("probes are dimension-checked like the corpus; NULL vecs name the problem") {
    // half-dimension probes would slice empty tail subspaces whose
    // NULL dots sum() silently skips — plausible-looking garbage ranks
    val shortProbes = Seq((9L, Array(1f, 0f, 0f, 0f))).toDF("pid", "pv")
    val enc = ProductQuant.encode(corpus, "id", "vec", cb)
    val e1 = intercept[IllegalArgumentException] {
      ProductQuant.adcTopK(enc, shortProbes, "pid", "pv", cb, 2).collect()
    }
    assert(e1.getMessage.contains("dimension 8"))
    // NULL probe vec: a named message, not an opaque NPE (and never a
    // silent pass that depends on which row limit(1) sampled)
    val nullProbes = spark.sql(
      "SELECT 9L AS pid, CAST(NULL AS ARRAY<FLOAT>) AS pv")
    val e2 = intercept[IllegalArgumentException] {
      ProductQuant.adcTopK(enc, nullProbes, "pid", "pv", cb, 2).collect()
    }
    assert(e2.getMessage.contains("NULL"))
  }

  test("encode fails fast on reserved scratch columns") {
    val e = intercept[IllegalArgumentException] {
      ProductQuant.encode(corpus.withColumn("__pq_sub0", lit(1)), "id", "vec", cb)
    }
    assert(e.getMessage.contains("__pq_sub0"))
  }

  // IVF-PQ: dim 4 = 2 subspaces x 2; coarse centroids along distinct axes.
  private val coarse = Array(
    0L -> Array(1f, 0f, 0f, 0f), 1L -> Array(0f, 1f, 0f, 0f))
  private lazy val ivfCorpus = Seq(
    (0L, Array(4f, 0f, 2f, 0f)), // routes to list 0, residual (3,0,2,0)
    (1L, Array(0f, 4f, 0f, 2f)), // routes to list 1, residual (0,3,0,2)
    (2L, Array(4f, 0f, 0f, 0f))  // routes to list 0, residual (3,0,0,0)
  ).toDF("id", "vec")

  test("residuals: routing to the cosine-nearest list, exact subtraction and norms") {
    val r = rows(ProductQuant.residuals(ivfCorpus, "id", "vec", coarse)
      .orderBy(col("id")))
      .map(x => (x.getLong(0), x.getLong(1),
        x.getSeq[Float](3).toList, x.getDouble(2)))
    assert(r(0) === ((0L, 0L, List(3f, 0f, 2f, 0f), math.sqrt(20.0))))
    assert(r(1) === ((1L, 1L, List(0f, 3f, 0f, 2f), math.sqrt(20.0))))
    assert(r(2) === ((2L, 0L, List(3f, 0f, 0f, 0f), 4.0)))
  }

  test("ivfPq ADC score is exact when a residual sits ON its codebook centroid") {
    val res = ProductQuant.residuals(ivfCorpus, "id", "vec", coarse)
    // seeds = residuals of ids 0 and 1 (both nonzero) -> id 0's residual
    // quantizes losslessly, so its self-score must be exactly 1.
    val rcb = ProductQuant.fit(res, "id", "residual",
      m = 2, subDim = 2, k = 2, iters = 0)
    val enc = ProductQuant.ivfPqEncode(ivfCorpus, "id", "vec", coarse, rcb)
    val probesDf = ivfCorpus.filter(col("id") === 0L)
      .select(col("id").as("probe_id"), col("vec"))
    val got = rows(ProductQuant.ivfPqTopK(enc, probesDf, "probe_id", "vec",
        coarse, rcb, nProbe = 2, kNN = 3))
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0L) === 1.0, s"lossless self-reconstruction must score 1.0: $got")
  }

  test("ivfPq with nProbe=1 only surfaces candidates from the probe's best list") {
    val res = ProductQuant.residuals(ivfCorpus, "id", "vec", coarse)
    val rcb = ProductQuant.fit(res, "id", "residual", 2, 2, 2, iters = 0)
    val enc = ProductQuant.ivfPqEncode(ivfCorpus, "id", "vec", coarse, rcb)
    val probesDf = ivfCorpus.filter(col("id") === 0L)
      .select(col("id").as("probe_id"), col("vec"))
    val ids = rows(ProductQuant.ivfPqTopK(enc, probesDf, "probe_id", "vec",
        coarse, rcb, nProbe = 1, kNN = 5)).map(_.getLong(1)).toSet
    assert(ids === Set(0L, 2L), s"list 1 must be pruned, got $ids") // id 1 lives in list 1
  }

  test("codebookDF round-trips the trained codebook (the persistence surface)") {
    // train once, persist the codebook as a table, reuse across jobs —
    // the flat (subspace, centroid_id, pos, component) layout must
    // reconstruct the in-memory Codebooks exactly
    val df = ProductQuant.codebookDF(corpus, cb)
    assert(df.count() === cb.m.toLong * cb.k * cb.subDim)
    val back = df.collect()
      .groupBy(r => r.getInt(0))
      .toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.groupBy(r => r.getLong(1)).toSeq.sortBy(_._1).map { case (cid, cs) =>
          (cid, cs.sortBy(_.getInt(2)).map(_.getFloat(3)))
        }.toArray
      }.toArray
    assert(back.length === cb.m)
    for (s <- 0 until cb.m; c <- 0 until cb.k) {
      assert(back(s)(c)._1 === cb.books(s)(c)._1)
      assert(back(s)(c)._2.toSeq === cb.books(s)(c)._2.toSeq)
    }
  }
}
