package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One EWMA output step. Top-level (not nested) so Spark's
  * encoder-generated code can construct it.
  */
case class EwmaStep(ts: java.sql.Timestamp, ewma: Double)

/** Time-series regularization: project an irregular per-key event
  * stream onto a fixed-interval spine, carrying the last observation
  * forward (LOCF) across gaps — the transform that turns sensor/feed
  * data (the reference's vélib snapshots are exactly this shape) into
  * the aligned matrix every downstream aggregate/model expects.
  *
  * Steps, all engine-portable:
  *  1. bucket observations to the step grid (integer floor-div on epoch
  *     seconds), keep the LAST observation per (key, bucket) —
  *     deterministic tie-break on (ts, value) descending;
  *  2. per-key spine = sequence(min bucket, max bucket) — generated
  *     map-side from one tiny per-key extent aggregate, NOT a global
  *     calendar cross join (a key active for a day doesn't pay for the
  *     corpus's full year);
  *  3. left-join observations onto the spine and fill with
  *     last-ignore-nulls over a running ROWS frame.
  *
  * Scale shape: one shuffle for the per-bucket dedup window, one tiny
  * extent aggregate, one equi-join on (key, bucket), one window on key
  * — each partitioned by the series key, so a 100 TB corpus of many
  * short series parallelizes per key. Dense spines (tiny step × long
  * extent) multiply rows by extent/step — caller's knob, documented.
  *
  * Leading buckets before a key's first observation cannot be filled
  * (nothing to carry) — the spine starts at each key's first bucket,
  * so the filled column is never null.
  */
object GapFill {

  def fillGaps(
      df: DataFrame, key: String, tsCol: String, valCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val reserved = Seq("__gf_bucket", "__gf_rn")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input already has a column named $c (reserved)"))
    // OUTPUT names guarded like the scratch names (the mergeIntervals
    // convention): a key named "bucket"/"observed" (or a valCol whose
    // _filled suffix lands on the key) would emit duplicate columns
    // and die far downstream in AMBIGUOUS_REFERENCE
    Seq("bucket", "observed", s"${valCol}_filled").foreach { c =>
      require(key != c && tsCol != c,
        s"column '$c' collides with fillGaps' output columns")
    }

    val bucket = timestamp_seconds(
      floor(unix_timestamp(col(tsCol)) / stepSeconds).cast("long") * stepSeconds)
    val perBucket = Window.partitionBy(col(key), col("__gf_bucket"))
      .orderBy(col(tsCol).desc, col(valCol).desc)
    // a NULL measurement is NO measurement: kept, it would mark its
    // bucket observed=true-but-unfilled, and a key whose first bucket
    // held only NULLs would void the never-null fill contract (the
    // spine extent now starts at the first REAL observation)
    val obs = df
      // a NULL series key would build spine rows the using-columns
      // joins below can never match (NULL != NULL), emitting
      // spine rows whose filled column is NULL against the never-null
      // contract — keyless series are excluded, like NULL measurements.
      // NULL timestamps bucket to NULL and can never meet the spine
      // either — dropped HERE instead of riding the window/dedup pass
      // before the join discards them anyway
      .filter(col(key).isNotNull && col(valCol).isNotNull &&
        col(tsCol).isNotNull)
      .withColumn("__gf_bucket", bucket)
      .withColumn("__gf_rn", row_number().over(perBucket))
      .filter(col("__gf_rn") === 1)
      .select(col(key), col("__gf_bucket"), col(valCol))
      // materialized ONCE (the triangleStats rationale): obs feeds the
      // spine's extent aggregate AND the left join — distinct subtrees
      // exchange reuse cannot dedup, so a lazy chain runs the window
      // sort + dedup over the corpus twice per call
      .localCheckpoint(true)

    val spine = obs.groupBy(col(key))
      .agg(min(col("__gf_bucket")).as("__gf_lo"), max(col("__gf_bucket")).as("__gf_hi"))
      .select(col(key), explode(sequence(col("__gf_lo"), col("__gf_hi"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("__gf_bucket"))

    val locf = Window.partitionBy(col(key)).orderBy(col("__gf_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq(key, "__gf_bucket"), "left")
      .select(col(key), col("__gf_bucket").as("bucket"),
        last(col(valCol), ignoreNulls = true).over(locf).as(s"${valCol}_filled"),
        col(valCol).isNotNull.as("observed"))
  }

  /** Exponentially-weighted moving average per key:
    * `s_0 = x_0`, `s_t = alpha*x_t + (1-alpha)*s_{t-1}` over each key's
    * time-ordered series — the standard smoother for sensor feeds and
    * rate metrics, where a windowed mean lags and a full mean forgets
    * nothing.
    *
    * EWMA is a RECURSION, which no window frame expresses: Spark (and
    * SQL) window aggregates cannot reference their own previous output.
    * The closed form `alpha * Σ (1-alpha)^(t-i) x_i` exists but routes
    * through `pow`, whose cross-engine bit behavior is exactly what the
    * portability rules avoid. So: one `collect_list` per key, one
    * in-aggregate `sort_array` (deterministic (ts, x) order, no window
    * shuffle), then ONE compiled fold closure per key emitting every
    * step (the LangModel scoring precedent — an expression-level
    * `aggregate` HOF must rebuild the output array per element,
    * Θ(L²) copy work that stalls a 50k-observation series; the
    * closure appends to a buffer, Θ(L), with the identical IEEE ops
    * in the identical order). Per-key memory is the series length —
    * the [[Packing.concatPacked]] batch-bounded contract; segment
    * epoch-long series upstream.
    *
    * Portability: each step is two multiplies and one add on doubles in
    * a FIXED fold order, so any engine replaying the recursion (DuckDB:
    * a recursive CTE) matches bit-for-bit — IEEE rounding is
    * deterministic; only operand order ever diverges. `alpha` must be
    * dyadic (m/2^n, n <= 10) so `1-alpha` is computed EXACTLY here and
    * an oracle can write both as plain literals — for a non-dyadic 0.3,
    * `1.0 - nearest(0.3)` need not equal `nearest(0.7)`, and the oracle's
    * written literal silently diverges from the plan's constant.
    *
    * Scale shape: one shuffle (the groupBy), fold and explode map-side
    * after it; output is one row per input observation.
    */
  def ewma(df: DataFrame, key: String, tsCol: String, valCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require((alpha * 1024.0) == math.rint(alpha * 1024.0),
      s"alpha must be dyadic (m/2^n, n <= 10) so 1-alpha is exact; got $alpha")
    val reserved = Seq("__ew_series", "__ew_out")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input already has a column named $c (reserved)"))
    // output/scratch names: key = "e" would make col("e.ts") resolve
    // against the key instead of the exploded struct; key = "ewma"
    // would emit duplicate output columns
    Seq("e", "ewma").foreach { c =>
      require(key != c && tsCol != c,
        s"column '$c' collides with ewma's output columns")
    }

    val series = df
      // NULL series keys excluded — the fillGaps policy in this same
      // file: a keyless series is not a series, and the NULL groupBy
      // key would otherwise emit a phantom smoothed stream mixing
      // every keyless event
      .filter(col(key).isNotNull &&
        col(tsCol).isNotNull && col(valCol).isNotNull)
      .groupBy(col(key))
      .agg(sort_array(collect_list(struct(
        col(tsCol).cast("timestamp").as("ts"),
        col(valCol).cast("double").as("x")))).as("__ew_series"))
    // the two multiplies and one add below are the EXACT ops, in the
    // exact order, the previous expression-HOF fold performed — the
    // closure only replaces the per-element array rebuild with an
    // O(L) buffer append
    val oneMinus = 1.0 - alpha
    val foldEwma = udf { (s: Seq[org.apache.spark.sql.Row]) =>
      val out = new scala.collection.mutable.ArrayBuffer[EwmaStep](s.length)
      var prev = 0.0
      var first = true
      s.foreach { r =>
        val x = r.getDouble(1)
        val v = if (first) { first = false; x } else alpha * x + oneMinus * prev
        prev = v
        out += EwmaStep(r.getTimestamp(0), v)
      }
      out.toSeq
    }
    series
      .select(col(key), explode(foldEwma(col("__ew_series"))).as("e"))
      .select(col(key), col("e.ts").as(tsCol), col("e.ewma").as("ewma"))
  }
}
