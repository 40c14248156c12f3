package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Count-min sketch: fixed-memory frequency estimation.
  *
  * The 100 TB problem: per-key exact counts over a high-cardinality
  * column (URLs, n-grams, user ids) produce a result as big as the key
  * space — too big to broadcast, often too big to store. A CMS
  * compresses the whole frequency distribution into a depth × width
  * counter matrix (e.g. 4 × 65536 longs = 2 MiB) with a one-sided
  * guarantee: `estimate(k) >= true_count(k)`, and
  * `estimate(k) <= true_count(k) + εN` with probability 1-δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. That makes it the standard
  * pre-filter for heavy-hitter mining (overestimates can only ADD
  * candidates, never lose one) and for skew detection feeding
  * salting/AQE decisions when the key space dwarfs memory.
  *
  * Scale shape: the build is ONE partial-combined aggregate over
  * depth rows per input row — map-side combine collapses each
  * partition to ≤ depth×width cells before the (bounded, ≤ depth×width
  * row) shuffle. The matrix is MERGEABLE: cell-wise sum of two
  * sketches equals the sketch of the unioned input (counters are
  * linear), so per-partition / per-day sketches roll up without
  * touching raw data — asserted in `SketchSpec`.
  *
  * Portability: row `i`'s column for a key is
  * `md5_63(key || ':' || i) mod width` (the [[Bloom]] / [[Sampling]]
  * recipe), so the ENTIRE sketch — every cell and every estimate — is
  * bit-reproducible in any engine with md5. Unlike the HLL / quantile
  * sketches (engine-specific binary state, rows-only checks), the CMS
  * registered query carries a FULL DuckDB oracle that replays the
  * matrix and the min.
  */
object Sketch {

  /** Column index of hash row `i` for `key`, in [0, width). */
  private def position(key: Column, i: Int, width: Int): Column =
    pmod(Text.md5Long63(concat(key.cast("string"), lit(":" + i))), lit(width.toLong))

  /** Build the counter matrix as (cms_row, cms_col, cnt) rows — sparse:
    * zero cells are absent (readers treat missing as 0). NULL keys are
    * excluded (no frequency identity to count under).
    */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth/$width")
    df.filter(col(keyCol).isNotNull)
      .select(posexplode(array((0 until depth).map(i => position(col(keyCol), i, width)): _*))
        .as(Seq("cms_row", "cms_col")))
      .groupBy("cms_row", "cms_col").agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the same (depth, width): cell-wise sum. */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty)
    sketches.reduce(_ unionByName _)
      .groupBy("cms_row", "cms_col").agg(sum(col("cnt")).as("cnt"))
  }

  /** Predicted equi-join cardinality from two sketches built with the
    * same (depth, width) over the two join keys: row `d`'s inner
    * product `Σ_w A[d][w]·B[d][w]` counts every true key match plus
    * collision noise, so `est = min_d Σ_w A[d][w]·B[d][w]` is a
    * ONE-SIDED overestimate of `|A ⋈ B|` (the AGMS/CMS inner-product
    * estimator; with A = B it bounds the self-join size `Σ_k c_k²`,
    * the classic shuffle-explosion predictor). The planning use: decide
    * broadcast vs shuffle vs salt BEFORE paying for the join, from two
    * fixed-memory passes that never shuffle the fact tables.
    *
    * Scale shape: both inputs are ≤ depth×width sparse cell rows, so
    * the matrix join and per-row sums are bounded work regardless of
    * the corpora the sketches summarize; a depth-row spine keeps rows
    * with zero overlapping cells in the min (their product is 0 —
    * disjoint key spaces estimate 0, not "empty result").
    *
    * CONTRACT: both sketches must be built over key columns of the
    * SAME data type. Cells key on the string rendering
    * (`md5(key::string)`), so a DECIMAL key's "5.00" and a BIGINT's
    * "5" never share a cell even though the SQL equi-join would match
    * them under coercion — across mismatched types the one-sided
    * overestimate guarantee is void (the estimate can read near 0 for
    * a huge real join). The sketch frame carries no type metadata, so
    * this cannot be checked here; align the key types before
    * [[cmsBuild]].
    */
  def cmsJoinSize(cmsA: DataFrame, cmsB: DataFrame): DataFrame = {
    // DECIMAL(38,0) products: at the ~1e12-row regime this estimator
    // exists for, per-cell counts reach ~N/width and the inner product
    // passes Long.MaxValue (65536 cells x (1.5e7)^2 ~ 1.5e19) — raw
    // Long arithmetic is an ANSI ARITHMETIC_OVERFLOW, or a silently
    // negative estimate that inverts the broadcast-vs-salt decision.
    // The estimate itself is served as DOUBLE (it is a planning
    // number; exact below 2^53, approximate past it).
    val prod = cmsA.as("a").join(cmsB.as("b"), Seq("cms_row", "cms_col"))
      .groupBy(col("cms_row"))
      .agg(sum(col("a.cnt").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * col("b.cnt")).as("ip"))
    // The row spine is the INTERSECTION of the sketches' own observed
    // rows, not a trusted depth argument and not their union: a depth
    // argument larger than the build depth used to inject phantom
    // all-zero rows that won the min and estimated a huge join at 0,
    // and a UNION spine re-opened the same hole for two sketches
    // BUILT at different depths (a row only the deeper sketch has
    // contributed ip=0 and won the min) — both invert the one-sided
    // guarantee with no error. Each shared row's inner product is
    // independently a valid >= bound, so the min over the SHARED rows
    // stays a valid (merely weaker) bound under any depth mismatch;
    // same-depth builds intersect to exactly rows 0..depth-1, so the
    // estimate is unchanged there. An empty intersection means at
    // least one corpus was empty — the outer coalesce's 0 is exact.
    val spine = cmsA.select(col("cms_row"))
      .intersect(cmsB.select(col("cms_row")))
    spine
      .join(prod, Seq("cms_row"), "left")
      .agg(coalesce(
          min(coalesce(col("ip"),
            lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 0)))),
          lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .cast("double").as("est_join_size"))
  }

  /** Point estimates for the distinct keys of `probes`: min over the
    * depth cells each key hashes to. Missing CELLS in a sketch row are
    * true zeros (sparse matrix), so a key the sketch never saw
    * estimates 0 unless every one of its cells collides with counted
    * keys. Missing ROWS are a different thing entirely — a caller
    * `depth` larger than the build's would hash into rows no build
    * wrote, and coalescing those phantom rows to 0 would estimate 0
    * for genuinely heavy keys (the cmsJoinSize phantom-row hole). The
    * probe therefore uses only rows PRESENT in the sketch (every build
    * row holds >= 1 cell whenever anything was counted, so presence ==
    * build depth): a depth mismatch degrades to min over the shared
    * rows — still a valid one-sided >= bound — instead of inverting
    * it. The sketch side is ≤ depth×width rows — broadcast it; the
    * probe side is never shuffled beyond its own distinct.
    *
    * CONTRACT (the [[cmsJoinSize]] one): probe keys must have the SAME
    * data type the sketch was built over — cells key on the string
    * rendering, so a DOUBLE probe "5.0" never finds a BIGINT build's
    * "5" cells and a genuinely heavy key silently estimates 0, voiding
    * the one-sided >= guarantee. The sketch frame carries no type
    * metadata to enforce this; align types before probing.
    */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0)
    // the sketch join introduces these names; a probe keyCol that
    // collides dies with AMBIGUOUS_REFERENCE deep in Catalyst instead
    // of here (the fail-fast contract every sibling operator keeps)
    Seq("cnt", "cms_row", "cms_col").foreach { c =>
      require(keyCol != c,
        s"probe key column '$c' collides with the sketch's columns")
    }
    // rows the build actually wrote (bounded: <= depth values). Row 0
    // exists in every non-empty build, so no probe key vanishes from
    // the output; an EMPTY sketch estimates nothing — correctly, since
    // nothing was counted. The inner join drops phantom depth rows.
    val builtRows = cms.select(col("cms_row")).distinct()
    probes.filter(col(keyCol).isNotNull).select(col(keyCol)).distinct()
      .select(col(keyCol),
        posexplode(array((0 until depth).map(i => position(col(keyCol), i, width)): _*))
          .as(Seq("cms_row", "cms_col")))
      .join(broadcast(builtRows), Seq("cms_row"))
      .join(broadcast(cms), Seq("cms_row", "cms_col"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
