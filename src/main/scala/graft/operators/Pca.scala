package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Top principal direction of an embedding corpus by POWER ITERATION —
  * the distributed linear-algebra step behind embedding whitening,
  * anisotropy diagnosis ("all my vectors point the same way"), and
  * 1-D spectral ordering. Complements [[Similarity.randomProject]]
  * (data-independent projection) with the data-DEPENDENT direction.
  *
  * Each iteration computes w = Aᵀ(A v) in two keyed aggregations over
  * the exploded (row, dim, value) view — never a materialized Gram
  * matrix (d×d is fine at d=64, but Aᵀ A via outer products would put
  * an n×d×d explode on the wire; the matvec form ships 2 bounded
  * aggregations and touches the corpus twice per iteration):
  *
  *  1. u_i = Σ_d x_{i,d} · v_d  — one shuffle keyed on the row id,
  *     v riding as a literal array;
  *  2. w_d = Σ_i u_i · x_{i,d}  — one shuffle keyed on the dimension
  *     (d groups).
  *
  * Every per-term product is cast to DECIMAL(38,12) before summing, so
  * both sums are shuffle-order independent and an external oracle
  * replays them exactly; the only floating-point steps are the per-term
  * products and the driver-side normalization (a left fold over the d
  * components in ascending-dimension order — the oracle's
  * `list_sum(list(... ORDER BY d))` does the same). The iterate starts
  * at e_0 (deterministic; if the corpus were exactly orthogonal to e_0
  * the next iterate would be 0 — require a nonzero norm and fail fast).
  *
  * The per-iteration vector (d doubles) is a bounded MODEL collected to
  * the driver (the codebook idiom); the corpus is never collected.
  * Output: (d, component) for d = 0..dim-1, components rounded to 6,
  * normalized to unit length with the sign fixed so the
  * lowest-numbered nonzero component is positive (eigenvectors are
  * sign-ambiguous; fixing it keeps the result unique).
  */
object Pca {

  def topComponent(embs: DataFrame, dim: Int, iters: Int): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")
    require(iters >= 1 && iters <= 16, s"iters must be in [1, 16], got $iters")
    // a vector longer than dim would die mid-job in element_at's ANSI
    // range check (and feed out-of-range d values to the driver fold)
    // — one limit-1 probe turns the common uniformly-wrong-dim call
    // into a real message. The probe inspects ONE arbitrary row: a
    // MIXED-dimension corpus can still slip past it (a longer stray
    // dies mid-iteration on the same ANSI error; a shorter one
    // contributes zero-padded terms and silently biases the
    // component) — pre-validate with filter(size(vec) =!= dim) when
    // the corpus is untrusted; a per-row scan-time check here would
    // add a full pass to every call for the trusted common case.
    // NULL-vec guard inside the probe itself: size(NULL) is NULL and a
    // bare getInt would throw an opaque NullPointerException — and only
    // WHEN limit(1) happened to sample the null row (a non-null sample
    // passes the probe and the null rows then silently vanish through
    // posexplode, biasing the component). Refuse nulls explicitly.
    embs.select(size(col("vec")).as("d")).limit(1).collect().foreach { r =>
      require(!r.isNullAt(0),
        "topComponent got a NULL vec — filter(col(\"vec\").isNotNull) " +
          "upstream (null rows would otherwise be dropped silently and " +
          "bias the component)")
      require(r.getInt(0) == dim,
        s"topComponent(dim = $dim) got vectors of dimension ${r.getInt(0)}")
    }
    val spark = embs.sparkSession
    import spark.implicits._

    val terms = embs.select(col("id"),
      posexplode(col("vec")).as(Seq("d", "x")))
      .select(col("id"), col("d"), col("x").cast("double").as("x"))

    var v = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val vLit = typedlit(v)
      val u = terms
        .select(col("id"), col("d"), col("x"),
          (col("x") * element_at(vLit, col("d") + 1))
            .cast(DecimalType(38, 12)).as("t"))
        .groupBy(col("id"))
        .agg(sum(col("t")).cast("double").as("u"))
      val w = terms.join(u, Seq("id"))
        .select(col("d"),
          (col("u") * col("x")).cast(DecimalType(38, 12)).as("t"))
        .groupBy(col("d"))
        .agg(sum(col("t")).cast("double").as("w"))
        .orderBy(col("d"))
        .collect().map(r => (r.getInt(0), r.getDouble(1)))
      val next = Array.fill(dim)(0.0)
      w.foreach { case (d, x) => next(d) = x }
      // ascending-d left fold, matching the oracle's ordered list_sum
      var nrm2 = 0.0
      next.foreach(x => nrm2 += x * x)
      val nrm = math.sqrt(nrm2)
      require(nrm > 0.0,
        "power iterate collapsed to zero (corpus orthogonal to the iterate)")
      v = next.map(_ / nrm)
    }
    val sign = v.find(_ != 0.0).map(x => if (x < 0) -1.0 else 1.0).getOrElse(1.0)
    v.zipWithIndex
      .map { case (x, d) =>
        // HALF_UP, the same rounding ROUND(x, 6) applies in both engines
        (d, BigDecimal(sign * x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toSeq.toDF("d", "component")
  }
}
