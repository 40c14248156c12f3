package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with` / `aggregate`) — no UDFs,
  * so the expressions stay inside whole-stage codegen and never serialize
  * row-by-row through a closure.
  *
  * All accumulation is left-to-right in Double, which makes results
  * bit-deterministic for a given array order (needed for oracle parity).
  */
object VectorOps {

  private def d(c: Column): Column = c.cast("double")

  private def expr(c: Column) = org.apache.spark.sql.graft.Bridge.expression(c)
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graft.Bridge.column(e)

  /** Native codegen'd dot product (see FloatVecDot — >100× the HOF
    * form on the pairwise-similarity hot path, same bits).
    */
  def dot(a: Column, b: Column): Column = col(FloatVecDot(expr(a), expr(b)))

  /** HOF reference implementation, kept for cross-checking the native
    * expression in tests.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  def normSq(a: Column): Column = col(FloatVecNormSq(expr(a)))

  def normSqHof(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + d(x) * d(x))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Degenerate-score sentinel: below any real cosine, so zero-norm /
    * NaN / null vectors rank WORST under every ordering in the engine
    * (brute-force, LSH, IVF all sort descending by this column).
    */
  val DegenerateCos = -2.0

  /** Cosine similarity, total over degenerate inputs. `try_divide`
    * returns bits identical to `/` whenever the divisor is nonzero, so
    * oracle parity on real vectors is unchanged; a zero-norm vector —
    * which under Spark 4's default ANSI mode would otherwise kill the
    * whole query with DIVIDE_BY_ZERO — yields NULL, NaN elements yield
    * NaN, and both are pinned to [[DegenerateCos]].
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    guardCos(try_divide(dot(a, b), norm(a) * norm(b)))

  /** Pin a possibly-NULL / possibly-NaN cosine to [[DegenerateCos]].
    * For callers that pre-compute norms per side and divide themselves.
    */
  def guardCos(c: Column): Column =
    coalesce(nanvl(c, lit(DegenerateCos)), lit(DegenerateCos))

  def euclideanDistSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, v) => acc + v)

  /** L2-normalized copy of the vector (as array<double>), so dot
    * products downstream ARE cosines — the standard pre-step before
    * writing an ANN index. A zero-norm vector normalizes to all-zero
    * rather than raising DIVIDE_BY_ZERO under ANSI mode; a vector
    * whose norm is NULL or NaN (a NULL or NaN ELEMENT — corrupted
    * embedding) normalizes to NULL, the [[quantizeInt8]] verdict.
    * The old coalesce rewrote such a vector to ALL-ZERO, which then
    * dot-scored 0.0 against every query — ranking corrupted vectors
    * ABOVE genuinely anti-correlated ones in top-k retrieval instead
    * of surfacing them.
    */
  def l2Normalize(a: Column): Column =
    // The norm is LET-BOUND as a single-element array's lambda variable:
    // referencing the aggregate Column directly inside the per-element
    // lambda would inline the O(d) subtree into every element (Catalyst
    // substitutes, it does not let-bind) — O(d²) per vector, the same
    // trap Text.ngrams documents. Bound this way it evaluates once.
    element_at(
      transform(array(norm(a)), nrm =>
        // a non-FINITE norm is degenerate too: an Inf element gives
        // norm = Inf (neither NULL nor NaN), and Inf/Inf = NaN slipped
        // a NaN component into the "unit" vector — whose dot score
        // then sorts ABOVE every real cosine (NaN ranks first desc),
        // putting the corrupted embedding at the top of retrieval
        // while quantizeInt8 correctly NULLed the same vector
        when(nrm.isNull || isnan(nrm) ||
            !nrm.between(-Double.MaxValue, Double.MaxValue),
          lit(null).cast("array<double>"))
          .otherwise(
            transform(a, x => coalesce(try_divide(d(x), nrm), lit(0.0))))),
      1)

  /** Symmetric int8 quantization: q_i = floor(x_i * 127 / max|x| + 0.5),
    * the portable round-half-up (both Spark and DuckDB compute it with
    * the same IEEE double ops, unlike engine-native round() whose
    * half-way rule differs). Values land in [-127, 127]; an all-zero
    * vector quantizes to all-zero (scale guarded, no ANSI error). The
    * per-vector scale (max|x| / 127) is what a reader needs to
    * dequantize — emit it alongside via [[quantScale]].
    *
    * 4× smaller than float32 — at 100 TB of embeddings this is the
    * difference between an index that fits executor memory and one
    * that spills; candidate scoring on int8 then re-ranking survivors
    * on the float vectors is the standard two-tier layout.
    */
  def quantizeInt8(a: Column): Column =
    // Degenerate vectors (a NULL, NaN, or ±Infinity element) quantize
    // to NULL — the same "no usable geometry" verdict the float tier's
    // -2 cosine sentinel gives them. Unguarded, a NULL element silently
    // became code 0 (a legitimate value), NaN poisoned the whole
    // vector to zeros under a NaN scale, and an Infinity element made
    // maxAbs infinite so Inf/Inf = NaN — whose tinyint cast KILLS the
    // query under ANSI mode — the two tiers of the candidates/re-rank
    // layout disagreeing on the same vector.
    // max|x| let-bound like l2Normalize's norm — once per vector, not
    // once per element. TINYINT: values are proven in [-127, 127], and
    // byte storage is the whole point — array<int> would be the same
    // width as the float32 input.
    when(!exists(a, degenerateElem),
      element_at(
        transform(array(maxAbs(a)), mx =>
          transform(a, x =>
            floor(coalesce(try_divide(d(x) * lit(127.0), mx), lit(0.0))
              + lit(0.5)).cast("tinyint"))),
        1))

  /** NULL, NaN, or ±Infinity — an element with no usable geometry. */
  private def degenerateElem(x: Column): Column =
    x.isNull || isnan(d(x)) ||
      abs(d(x)) === lit(Double.PositiveInfinity)

  private def maxAbs(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(d(x))))

  /** Dequantization scale paired with [[quantizeInt8]]: max|x| / 127
    * (0.0 for an all-zero vector, NULL for a degenerate one — the
    * quantizeInt8 verdict, including ±Infinity, whose scale would
    * otherwise read Infinity).
    */
  def quantScale(a: Column): Column =
    when(!exists(a, degenerateElem), maxAbs(a) / lit(127.0))
}
