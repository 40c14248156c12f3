package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing-window z-score anomaly detection over keyed count series —
  * the volume-spike tripwire every ingestion pipeline wants on its
  * per-source/per-hour row counts: "this hour's count is k sigmas off
  * its own recent history". Purely retrospective (the frame ends at
  * the PREVIOUS bucket), so an anomalous bucket cannot vote itself
  * normal.
  *
  * Scale shape: the input is already the per-(key, bucket) aggregate —
  * bounded by keys × buckets, not data rows; one hash partitioning on
  * the key serves both window frames. Portability: the trailing frame
  * keeps exact integer `Σx` and `Σx²`, so
  * `var = (n·Σx² − (Σx)²) / n²` and `z = (x − Σx/n) / sqrt(var)` are
  * a fixed chain of single IEEE steps over exact integers — an
  * external engine lands on identical bits; z rounds to 6.
  */
object Anomaly {

  /** Flag buckets whose value sits more than `threshold` trailing
    * standard deviations from the trailing mean of the previous
    * `window` buckets (row-count frame — gaps in the series are the
    * caller's to fill first, e.g. via [[GapFill]]). Buckets with
    * fewer than `minPrior` prior observations, or a zero-variance
    * history, read NULL z and never flag (a constant history makes
    * "sigmas" meaningless — the NULL is the audit, not a silent 0).
    * Output: input columns + (mean_prior, z, is_anomaly).
    *
    * `bucketCol` must be UNIQUE within each key (the cusumChangePoints
    * contract): duplicate (key, bucket) rows make the rows-based
    * trailing frame — and therefore z and is_anomaly — depend on the
    * nondeterministic tie order. The input is the per-(key, bucket)
    * AGGREGATE by construction; aggregate before calling.
    */
  def trailingZscores(
      series: DataFrame, keyCol: String, bucketCol: String, valueCol: String,
      window: Int, minPrior: Int, threshold: Double): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(minPrior >= 2 && minPrior <= window,
      s"minPrior must be in [2, window], got $minPrior")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    Seq("mean_prior", "z", "is_anomaly", "__n", "__sx", "__sxx").foreach(c =>
      require(!series.columns.contains(c),
        s"input column '$c' collides with trailingZscores' output"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(-window.toLong, -1L)
    // NULL values are filtered at ENTRY (the cusumChangePoints
    // handling): kept, they would occupy slots in the rows-based frame
    // and silently displace real history — 13 NULL buckets among the
    // prior 24 rows starve __n below minPrior and a genuine spike
    // never flags. Values that cannot survive the DECIMAL ARITHMETIC
    // below are treated the same as NULL: the corrupt reading costs
    // its own row, never the detector run. The bound covers the whole
    // expression chain, not just the single cast (the r9 hole: 2e19
    // passes a 9e37 single-cast bound but x*x = 4e38 overflows
    // DECIMAL(38,0) and ANSI-kills the job): with |x| <= 9e18/window,
    // the largest intermediate — n·Σx² and (Σx)², both <=
    // (window·B)² = 8.1e37 — stays under the type's 10^38−1 ceiling.
    // For a count series (this operator's domain) the bound excludes
    // nothing real: 9e18/window is the long range divided by the
    // window length.
    val x = col(valueCol).cast(DecimalType(38, 0))
    val n = count(col(valueCol)).over(w)
    val sx = sum(x).over(w)
    val sxx = sum(x * x).over(w)
    val withStats = series.filter(
      graft.functions.Num.finiteWithin(col(valueCol), 9e18 / window))
      .withColumn("__n", n).withColumn("__sx", sx).withColumn("__sxx", sxx)
    val nD = col("__n").cast(DecimalType(38, 0))
    val mean = col("__sx").cast("double") / col("__n").cast("double")
    val varNum = (nD * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val varDen = (nD * nD).cast("double")
    val z = try_divide(col(valueCol).cast("double") - mean,
      sqrt(varNum / varDen))
    // portableRound6, not builtin round (r11 verdict item 6): both
    // mean and z are integer-ratio doubles (Σx/n; a fixed IEEE chain
    // over exact integers), exactly the family whose representable
    // half-ulp ties made Spark's HALF_UP and DuckDB's banker's ROUND
    // disagree in r9/r10 — and because the ratios sit in plain Scala
    // vals, this was the ONE site the RoundTriageSpec source scan
    // could not see (its documented blind spot, closed by conversion).
    withStats
      .withColumn("mean_prior",
        when(col("__n") >= minPrior, graft.functions.Num.portableRound6(mean)))
      .withColumn("z",
        when(col("__n") >= minPrior, graft.functions.Num.portableRound6(z)))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__n", "__sx", "__sxx")
  }
  /** CUSUM change-point localization over an ordered integer series —
    * the LEVEL-SHIFT detector beside [[trailingZscores]]'s point-spike
    * screen (a regime change never trips a spike test; its cumulative
    * drift is unmissable). Classic centered cumulative sum, cleared of
    * division so everything is exact integer arithmetic:
    * `S'_t = n·Σ_{i<=t} x_i − t·Σx` (the textbook
    * `Σ (x_i − x̄)` scaled by n), and the most likely single change
    * point is the bucket maximizing |S'_t| — flagged `is_peak`, ties
    * broken to the earliest bucket.
    *
    * Scale shape: runs over the per-bucket aggregate spine (one row
    * per bucket, not data rows); one hash partitioning per key serves
    * the ordered window, one bounded window pass finds the peak.
    * `cusum` is exact DECIMAL(38,0) internally END TO END: the peak
    * comparison runs on the decimal, so `is_peak` stays correct at any
    * magnitude; the emitted `cusum` column is a try_cast to long —
    * NULL (never a crash, never a silently-missing peak) for the rare
    * bucket whose n·Σx clears 2^63. (The previous doc claimed callers
    * could "keep the decimal column instead" — no API path did, and
    * the unconditional cast threw under ANSI right where the operator
    * was needed most.) Output: input columns + (t, cusum, is_peak).
    *
    * NULL `valueCol` rows are filtered at entry: sum() skips a null
    * while row_number() would still count it, so a retained null row
    * would skew S'_t for every bucket at or after it — the same
    * explicit handling [[trailingZscores]] applies.
    */
  def cusumChangePoints(
      series: DataFrame, partCols: Seq[String], orderCol: String,
      valueCol: String): DataFrame = {
    // orderCol must be UNIQUE within the (partCols) scope: duplicate
    // order values make row_number's t — and therefore the cusum and
    // its peak — shuffle-order-dependent (a distinct-count check would
    // double the operator's cost, so uniqueness is the documented
    // contract, the packByTokenBudget convention).
    Seq("t", "cusum", "is_peak", "__cum", "__n", "__sx", "__best",
      "__cusum_d").foreach(c =>
      require(!series.columns.contains(c),
        s"input column '$c' collides with cusumChangePoints' columns"))
    // same guard class as trailingZscores, bounded for the whole
    // expression chain: the largest intermediates are n·Σx and t·Σx,
    // both <= n²·B for partition length n and |x| <= B. At B = 9e18
    // (the long range — the operator's contract is an INTEGER series)
    // the DECIMAL(38,0) ceiling holds for spines up to ~3e9 buckets
    // per key (n²·B < 10^38 ⇔ n < 3.3e9) — far past any real
    // per-bucket aggregate; a longer spine needs coarser buckets, not
    // a wider decimal. NaN/Inf/over-magnitude rows cost themselves,
    // never the run (the no-measurement semantic).
    val series0 = series.filter(
      graft.functions.Num.finiteWithin(col(valueCol), 9e18))
    // Window is imported at file scope (trailingZscores uses it bare)
    val base = if (partCols.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(partCols.map(col): _*)
    val wOrd = base.orderBy(col(orderCol))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val wAll = base.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val x = col(valueCol).cast(DecimalType(38, 0))
    val stats = series0
      .withColumn("t", row_number().over(wOrd))
      .withColumn("__cum", sum(x).over(wCum))
      .withColumn("__n", count(x).over(wAll).cast(DecimalType(38, 0)))
      .withColumn("__sx", sum(x).over(wAll))
      // exact decimal end to end; the long rendering happens LAST and
      // via try_cast (see Scaladoc — the unconditional cast threw
      // under ANSI past 2^63, or with ANSI off silently nulled every
      // is_peak)
      .withColumn("__cusum_d",
        col("__n") * col("__cum")
          - col("t").cast(DecimalType(38, 0)) * col("__sx"))
    // earliest-bucket tie-break: max over (|cusum|, -t) structs,
    // decided on the EXACT decimal
    val withBest = stats.withColumn("__best",
      max(struct(abs(col("__cusum_d")).as("a"), (-col("t")).as("nt"))).over(wAll))
    withBest
      .withColumn("cusum", expr("try_cast(__cusum_d AS LONG)"))
      .withColumn("is_peak",
        abs(col("__cusum_d")) === col("__best.a") &&
          -col("t") === col("__best.nt"))
      .drop("__cum", "__n", "__sx", "__best", "__cusum_d")
  }
}
