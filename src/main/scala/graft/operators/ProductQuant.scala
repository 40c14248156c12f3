package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorOps

/** Product quantization (PQ): compress a d-dim float corpus to m
  * small codes by splitting each vector into m subvectors and learning
  * an independent k-centroid codebook per subspace (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * Why this matters at 100 TB: a 64-dim float32 corpus is 256 B/vector;
  * PQ at m=8, k<=256 stores 8 one-byte codes (+ one float norm) —
  * ~32× smaller, the difference between an ANN index that lives in
  * executor memory and one that spills. Scoring against codes costs a
  * LUT lookup per subspace instead of a d-wide dot product.
  *
  * Decomposition: the DOT PRODUCT is separable over subspaces —
  * `dot(q, x) = Σ_s dot(q_s, x_s) ≈ Σ_s dot(q_s, c_{s, code_s})` —
  * so with each vector's EXACT full norm stored alongside its codes
  * (one scalar, essentially free), approximate cosine is
  * `pq_dot / (|q|·|x|)`: asymmetric distance computation (ADC) in the
  * same cosine ranking the exact operators use, re-rankable by
  * [[Similarity]]'s exact path.
  *
  * Training reuses [[KMeans.fit]] per subspace unchanged (same
  * deterministic seeding, tie-breaks, and 6-place portable rounding),
  * so the full train → encode → score pipeline replays bit-for-bit in
  * an external engine — the registered queries carry complete DuckDB
  * oracles, sketch-free.
  *
  * Scale shape: training touches the corpus m·iters times with
  * map-side-only assignment (codebooks ride the plan as literals);
  * encoding is ONE map-side projection (zero shuffles); ADC scoring is
  * a broadcast equi-join of the exploded code column against the
  * (probes × m × k)-row LUT, one partial-combined sum per (probe,
  * candidate), and a map-side [[TopKAggregator]] — the exchange after
  * scoring carries k rows per probe per partition, never the corpus.
  *
  * Portability arithmetic: per-subspace LUT dots are rounded to 6
  * places then summed EXACTLY as DECIMAL(38,12) — m doubles added in
  * shuffle order would be partition-order-dependent; the decimal sum
  * is not. The final score rounds after the norm division (the
  * [[KMeans]] recipe).
  */
object ProductQuant {

  /** Per-subspace codebooks: `books(s)` lists that subspace's
    * (centroid_id, centroid) pairs; every subvector has length
    * `subDim`.
    */
  case class Codebooks(subDim: Int, books: Array[Array[(Long, Array[Float])]]) {
    def m: Int = books.length
    def k: Int = books.head.length
  }

  private def subCol(vecCol: String, s: Int, subDim: Int): Column =
    slice(col(vecCol), s * subDim + 1, subDim)

  /** Fail fast when the vector dimension is not m·subDim: a short
    * vector silently yields EMPTY tail subspaces (every centroid ties
    * at the degenerate score and all codes read 0), a long one drops
    * tail dimensions while vec_norm still covers them — both produce
    * plausible-looking garbage codes. One limit-1 probe job.
    */
  private def requireDim(
      df: DataFrame, vecCol: String, want: Int, who: String): Unit =
    df.select(size(col(vecCol)).as("d")).limit(1).collect().foreach { r =>
      // NULL guard first: size(NULL) is NULL and a bare getInt throws
      // an opaque NPE — and only when limit(1) happened to sample the
      // null row (the Pca.topComponent probe bug, same fix)
      require(!r.isNullAt(0),
        s"$who got a NULL $vecCol — filter nulls upstream (they would " +
          "otherwise encode to degenerate code 0 silently)")
      require(r.getInt(0) == want,
        s"$who expects vectors of dimension $want (m*subDim), " +
          s"got ${r.getInt(0)}")
    }

  /** Train m independent codebooks over `corpus(idCol, vecCol)` whose
    * vectors have dimension m * subDim. Model size m·k·subDim floats —
    * driver-bounded, the legitimate broadcast-model idiom.
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int, k: Int, iters: Int): Codebooks = {
    require(m > 0 && subDim > 0, s"m/subDim must be positive, got $m/$subDim")
    requireDim(corpus, vecCol, m * subDim, "ProductQuant.fit")
    val books = (0 until m).map { s =>
      KMeans.fit(
        corpus.select(col(idCol).as("id"), subCol(vecCol, s, subDim).as("vec")),
        k, iters)
    }.toArray
    Codebooks(subDim, books)
  }

  /** Codebooks flattened to (subspace, centroid_id, pos, component)
    * rows — the element-exact oracle/storage shape ([[KMeans.fitDF]]).
    */
  def codebookDF(corpus: DataFrame, cb: Codebooks): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    cb.books.zipWithIndex.flatMap { case (book, s) =>
      book.flatMap { case (cid, v) =>
        v.zipWithIndex.map { case (x, p) => (s, cid, p, x) }
      }
    }.toSeq.toDF("subspace", "centroid_id", "pos", "component")
  }

  /** Per-subspace norms of the codebook centroids, for cosine
    * assignment (same left-to-right double fold as the oracle).
    */
  private def withNorms(book: Array[(Long, Array[Float])]) =
    book.map { case (cid, v) =>
      var n = 0.0
      v.foreach(x => n += x.toDouble * x.toDouble)
      (cid, v, math.sqrt(n))
    }

  /** Encode the corpus: (id, vec_norm, subspace, code) rows, where
    * `code` is the cosine-nearest centroid of that subspace (ties to
    * the lowest centroid id — the [[KMeans]] assignment rule) and
    * `vec_norm` is the EXACT full-vector norm kept for ADC. Map-side
    * only: the codebooks ride the plan as literals, nothing shuffles.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks, passthrough: Seq[String] = Nil): DataFrame = {
    requireDim(corpus, vecCol, cb.m * cb.subDim, "ProductQuant.encode")
    val reserved = (0 until cb.m).flatMap(s =>
      Seq(s"__pq_sub$s", s"__pq_n$s", s"__pq_code$s"))
    reserved.foreach(c => require(!corpus.columns.contains(c),
      s"input already has a column named $c (reserved)"))
    // passthrough names must not collide with the output schema or the
    // scratch aliases — a collision would otherwise die far downstream
    // in AMBIGUOUS_REFERENCE instead of here
    val outNames = Seq("id", "vec_norm", "subspace", "code")
    passthrough.foreach(p => require(
      !outNames.contains(p) && !reserved.contains(p),
      s"passthrough column '$p' collides with encode's output/scratch names"))
    val carry = passthrough.map(col)
    // Two projection boundaries so each subvector and its norm evaluate
    // ONCE (Catalyst substitutes, it does not let-bind — referencing
    // the slice inside every centroid score would re-slice k times).
    val subs = corpus.select(
      Seq(col(idCol).as("id"), VectorOps.norm(col(vecCol)).as("vec_norm")) ++
        carry ++
        (0 until cb.m).map(s => subCol(vecCol, s, cb.subDim).as(s"__pq_sub$s")): _*)
    val normed = subs.select(
      Seq(col("id"), col("vec_norm")) ++ carry ++
        (0 until cb.m).flatMap(s => Seq(col(s"__pq_sub$s"),
          VectorOps.norm(col(s"__pq_sub$s")).as(s"__pq_n$s"))): _*)
    val codes = (0 until cb.m).map { s =>
      val best = array_max(array(withNorms(cb.books(s)).toIndexedSeq.map {
        case (cid, cv, cn) =>
          struct(
            VectorOps.guardCos(try_divide(
              VectorOps.dot(col(s"__pq_sub$s"), typedlit(cv)),
              col(s"__pq_n$s") * lit(cn))).as("s"),
            lit(-cid).as("negc"))
      }: _*))
      (-best.getField("negc")).as(s"__pq_code$s")
    }
    normed.select(Seq(col("id"), col("vec_norm")) ++ carry ++ codes: _*)
      .select(Seq(col("id"), col("vec_norm")) ++ carry :+
        posexplode(array((0 until cb.m).map(s => col(s"__pq_code$s")): _*))
          .as(Seq("subspace", "code")): _*)
  }

  /** IVF-PQ index rows: (id, list_id, vec_norm, subspace, code) — the
    * composition real ANN systems deploy (FAISS's IVFPQ; Jégou et al.
    * §V): a coarse quantizer routes each vector to an inverted list,
    * and PQ codes store the RESIDUAL `vec - centroid(list)` — residuals
    * concentrate near zero, so the same code budget quantizes them far
    * more accurately than raw vectors.
    *
    * `centroids` is the coarse codebook (a small trained model —
    * [[KMeans.fit]] output, or a deterministic subset for tests);
    * `cb` quantizes residuals, trained by [[fit]] over the residual
    * frame this method also produces (pass the same centroids).
    * Assignment is the [[KMeans]] cosine rule (ties to lowest id);
    * residual components are quantized to float (CAST REAL — the
    * replayable step). Map-side only, like [[encode]].
    */
  def ivfPqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Long, Array[Float])], cb: Codebooks): DataFrame = {
    val res = residuals(corpus, idCol, vecCol, centroids)
    // list_id/orig_norm ride THROUGH the encode projections: the old
    // join-back form scanned the residual frame twice and paid a
    // corpus-sized shuffle, contradicting the map-side contract
    encode(res, "id", "residual", cb,
        passthrough = Seq("list_id", "orig_norm"))
      .select(col("id"), col("list_id"), col("orig_norm").as("vec_norm"),
        col("subspace"), col("code"))
  }

  /** (id, list_id, residual float vector, orig_norm) for `corpus`
    * under the coarse `centroids`: the training frame for the residual
    * codebooks AND the encode input. The chosen centroid rides the
    * plan as a literal selected by the assignment argmax — map-side,
    * no shuffle.
    */
  def residuals(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Long, Array[Float])]): DataFrame = {
    require(centroids.nonEmpty, "need at least one coarse centroid")
    val scored = withNorms(centroids)
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"),
      VectorOps.norm(col(vecCol)).as("orig_norm"))
    val best = array_max(array(scored.toIndexedSeq.map { case (cid, cv, cn) =>
      struct(
        VectorOps.guardCos(try_divide(
          VectorOps.dot(col("__v"), typedlit(cv)),
          col("orig_norm") * lit(cn))).as("s"),
        lit(-cid).as("negc"))
    }: _*))
    val withList = base
      .select(col("id"), col("__v"), col("orig_norm"),
        (-best.getField("negc")).as("list_id"))
    // Literal centroid selection: element_at over an array-of-arrays
    // literal, indexed by the list's POSITION in `centroids` (+1).
    val centroidLookup = array(centroids.toIndexedSeq.map {
      case (_, cv) => typedlit(cv)
    }: _*)
    val idxOf = centroids.map(_._1).zipWithIndex.toMap
    val posExpr = centroids.toIndexedSeq.foldLeft(lit(-1)) { case (acc, (cid, _)) =>
      when(col("list_id") === cid, lit(idxOf(cid) + 1)).otherwise(acc)
    }
    withList.select(col("id"), col("list_id"), col("orig_norm"),
      transform(
        zip_with(col("__v"), element_at(centroidLookup, posExpr),
          (x, c) => x.cast("double") - c.cast("double")),
        d => d.cast("float")).as("residual"))
  }

  /** IVF-PQ ADC top-k: probes visit only their `nProbe` best lists;
    * each candidate scores as
    * `dot(q, x) ≈ dot(q, centroid(list)) + Σ_s LUT_s[code_s]`
    * over the stored exact norms. Both parts are rounded to 6 places
    * and DECIMAL-summed, so the score replays cross-engine. The list
    * pruning is the scale lever: at nList=1024, nProbe=32, the scan
    * touches ~3% of the codes.
    */
  def ivfPqTopK(encoded: DataFrame, probes: DataFrame, probeIdCol: String,
      probeVecCol: String, centroids: Array[(Long, Array[Float])],
      cb: Codebooks, nProbe: Int, kNN: Int): DataFrame = {
    require(nProbe > 0 && kNN > 0, s"nProbe/kNN must be positive: $nProbe/$kNN")
    // probes are sliced into m subspaces exactly like the corpus was:
    // a wrong-dimension probe makes FloatVecDot return NULL for the
    // out-of-range subspaces, sum() silently skips them, and the
    // rankings are plausible-looking garbage — the hazard requireDim's
    // doc names, enforced on the corpus side but (pre-r9) not here
    requireDim(probes, probeVecCol, cb.m * cb.subDim, "ProductQuant.ivfPqTopK")
    val scored = withNorms(centroids)
    val subs = probes.select(
      Seq(col(probeIdCol).as("probe_id"), col(probeVecCol).as("__pv"),
        VectorOps.norm(col(probeVecCol)).as("__pq_pnorm")) ++
        (0 until cb.m).map(s =>
          subCol(probeVecCol, s, cb.subDim).as(s"__pq_sub$s")): _*)
    // Per probe: nProbe best lists, each with the rounded coarse dot.
    val listEntries = scored.toIndexedSeq.map { case (cid, cv, cn) =>
      struct(lit(cid).as("list_id"),
        round(VectorOps.dot(col("__pv"), typedlit(cv)), 6).as("cdot"),
        VectorOps.guardCos(try_divide(
          VectorOps.dot(col("__pv"), typedlit(cv)),
          col("__pq_pnorm") * lit(cn))).as("cscore"))
    }
    // Routing frame: nProbe rows per probe — (list_id, coarse dot,
    // probe norm). Kept SEPARATE from the residual LUT: the old fused
    // form exploded the m·k pdot entries once per VISITED LIST even
    // though pdot is independent of list_id, inflating the broadcast
    // nProbe-fold (nProbe=32 × m·k=2048 = 65k rows per probe where
    // 2048 + 32 suffice). The nProbe pick is IN-EXPRESSION — ascending
    // struct(-cscore, list) sort of the per-row list array, then
    // slice — exactly `Similarity.routeProbes`' recipe, because a
    // row_number window here costs a probe-side exchange + sort for an
    // ordering already computable per row (cscore is guardCos-pinned
    // finite, so struct ordering ≡ (cscore desc, list_id asc) with no
    // NaN asymmetry between the two forms).
    val route = subs
      .select(col("probe_id"), col("__pq_pnorm"),
        explode(slice(array_sort(array(listEntries.map(le =>
            struct((-le.getField("cscore")).as("negs"),
              le.getField("list_id").as("list_id"),
              le.getField("cdot").as("cdot"))): _*)),
          1, nProbe)).as("le"))
      .select(col("probe_id"), col("__pq_pnorm"),
        col("le.list_id").as("list_id"), col("le.cdot").as("cdot"))
    // Residual LUT per probe: m*k rounded dots, once per probe.
    val entries = (0 until cb.m).flatMap { s =>
      cb.books(s).map { case (cid, cv) =>
        struct(lit(s).as("subspace"), lit(cid).as("code"),
          round(VectorOps.dot(col(s"__pq_sub$s"), typedlit(cv)), 6).as("pdot"))
      }
    }
    val plut = subs
      .select(col("probe_id"), explode(array(entries: _*)).as("e"))
      .select(col("probe_id"), col("e.subspace").as("subspace"),
        col("e.code").as("code"), col("e.pdot").as("pdot"))
    encoded
      .join(broadcast(route), Seq("list_id"))
      .join(broadcast(plut), Seq("probe_id", "subspace", "code"))
      .groupBy(col("probe_id"), col("id"))
      .agg(
        (sum(col("pdot").cast(DecimalType(38, 12)))
          + first(col("cdot")).cast(DecimalType(38, 12)))
          .cast("double").as("pq_dot"),
        first(col("vec_norm")).as("__nx"), first(col("__pq_pnorm")).as("__nq"))
      .select(col("probe_id"), col("id"),
        VectorOps.guardCos(round(
          try_divide(col("pq_dot"), col("__nq") * col("__nx")), 6)).as("score"))
      .groupBy(col("probe_id"))
      .agg(TopK.topK(kNN)(col("id"), col("score")).as("nn"))
      .select(col("probe_id"), explode(col("nn")).as("e"))
      .select(col("probe_id"), col("e.id").as("neighbor_id"),
        col("e.score").as("pq_score"))
  }

  /** ADC top-k: for each probe, the `kNN` candidates with the highest
    * PQ-approximated cosine. `encoded` is [[encode]]'s output (the
    * stored index); probes bring full vectors. Output:
    * (probe_id, neighbor_id, pq_score).
    */
  def adcTopK(encoded: DataFrame, probes: DataFrame, probeIdCol: String,
      probeVecCol: String, cb: Codebooks, kNN: Int): DataFrame = {
    require(kNN > 0, s"kNN must be positive, got $kNN")
    // same probe-dimension contract as ivfPqTopK (see there)
    requireDim(probes, probeVecCol, cb.m * cb.subDim, "ProductQuant.adcTopK")
    val subs = probes.select(
      Seq(col(probeIdCol).as("probe_id"),
        VectorOps.norm(col(probeVecCol)).as("__pq_pnorm")) ++
        (0 until cb.m).map(s =>
          subCol(probeVecCol, s, cb.subDim).as(s"__pq_sub$s")): _*)
    // LUT: m·k (subspace, code, rounded dot) entries per probe.
    val entries = (0 until cb.m).flatMap { s =>
      cb.books(s).map { case (cid, cv) =>
        struct(lit(s).as("subspace"), lit(cid).as("code"),
          round(VectorOps.dot(col(s"__pq_sub$s"), typedlit(cv)), 6).as("pdot"))
      }
    }
    val lut = subs.select(col("probe_id"), col("__pq_pnorm"),
        explode(array(entries: _*)).as("e"))
      .select(col("probe_id"), col("__pq_pnorm"),
        col("e.subspace").as("subspace"), col("e.code").as("code"),
        col("e.pdot").as("pdot"))
    encoded
      .join(broadcast(lut), Seq("subspace", "code"))
      .groupBy(col("probe_id"), col("id"))
      .agg(
        sum(col("pdot").cast(DecimalType(38, 12))).cast("double").as("pq_dot"),
        first(col("vec_norm")).as("__nx"), first(col("__pq_pnorm")).as("__nq"))
      .select(col("probe_id"), col("id"),
        VectorOps.guardCos(round(
          try_divide(col("pq_dot"), col("__nq") * col("__nx")), 6)).as("score"))
      .groupBy(col("probe_id"))
      .agg(TopK.topK(kNN)(col("id"), col("score")).as("nn"))
      .select(col("probe_id"), explode(col("nn")).as("e"))
      .select(col("probe_id"), col("e.id").as("neighbor_id"),
        col("e.score").as("pq_score"))
  }
}
