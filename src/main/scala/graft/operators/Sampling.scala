package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * `rand()`-based sampling is unstable: re-runs, retries, and different
  * cluster sizes all reshuffle which rows land in a split, which makes
  * train/holdout leakage silent and experiments unrepeatable. Hashing a
  * stable KEY instead gives every row a permanent bucket — the same doc
  * lands in the same split on every engine, every run, at every scale —
  * and the whole transform is a map-side codegen'd projection: no
  * shuffle, no state, scan-speed at 100 TB.
  *
  * Buckets come from the md5-derived 63-bit hash ([[Text.md5Long63]]),
  * so any engine with md5 reproduces the assignment bit-for-bit (the
  * DuckDB oracle does; the 63-bit mask keeps signed/unsigned modulo in
  * agreement across engines).
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a key column (hashed via its
    * canonical string form, so long and string keys agree across
    * engines). A NULL key yields a NULL bucket: `sampleByHash` then
    * DROPS the row (null fails every comparison) and `hashSplit` sends
    * it to "holdout" — a keyless row must never leak into training
    * data, and both outcomes are deterministic.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column = {
    require(buckets > 0)
    pmod(Text.md5Long63(key.cast("string")), lit(buckets.toLong))
  }

  /** Deterministic fraction sample: keeps rows whose bucket falls below
    * `pct` of 100. Approximately pct% of rows for a well-spread key,
    * exactly the same rows every run.
    */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(hashBucket(col(keyCol)) < pct)
  }

  /** Permanent uniform draw in [0, 1] per key: the 63-bit md5 hash over
    * 2^63 (Long.MaxValue.toDouble rounds to exactly 2^63, and DuckDB's
    * `/ 9223372036854775808.0` parses to the same double, so the quotient
    * is bit-identical cross-engine). The closed upper bound is the
    * double rounding: a hash in [2^63-512, 2^63) rounds to 2^63 and
    * yields exactly 1.0 (probability ~5.5e-17 per key), so `u < 1.0`
    * can — astronomically rarely — drop a row even at weight 1.0; both
    * engines agree on the draw, so parity is unaffected.
    */
  def hashUnit(key: Column): Column =
    Text.md5Long63(key.cast("string")).cast("double") / lit(Long.MaxValue.toDouble)

  /** Deterministic weighted (Bernoulli) sampling: keep a row iff
    * u(key) < weight — per-row keep probability equals `weight` (a
    * column in [0, 1]; values outside clamp naturally: <=0 never keeps,
    * >=1 keeps — up to [[hashUnit]]'s ~5.5e-17 closed-bound edge). The draw is a pure function of the key, so
    * decisions are reproducible across runs, engines, and partitionings,
    * and re-sampling a grown corpus never flips an existing row. Pure
    * map-side filter — scan-speed at any scale. The standard
    * quality-weighted corpus downsampling step (weight = a quality
    * score, keep good documents proportionally more often).
    */
  def sampleByWeight(df: DataFrame, keyCol: String, weight: Column): DataFrame =
    // NaN is LARGER than every number under Spark's ordered comparisons,
    // so without the guard a 0.0/0.0 quality score would always keep
    df.filter(hashUnit(col(keyCol)) < weight &&
      !isnan(weight.cast("double")))

  /** Deterministic weighted sampling WITHOUT replacement, exactly k
    * rows (Efraimidis–Spirakis A-ES, IPL 2006): each row draws the key
    * `ln(u) / w` with `u = hashUnit(key)` and the k LARGEST keys win —
    * provably equivalent to sequential weighted draws without
    * replacement. [[sampleByWeight]] keeps a BERNOULLI fraction
    * (output size varies); this keeps an exact count with inclusion
    * probability proportional to weight — the fixed-budget selection
    * shape ("exactly 1M docs, quality-weighted").
    *
    * `ln(u)/w` is the monotone log form of the textbook `u^(1/w)` —
    * same ordering, but ln is the one transcendental this project has
    * verified bit-identical across engines (pow is not). The selection
    * is a TakeOrderedAndProject (size-k heap per partition, k rows to
    * the driver-side merge, no global sort). Non-positive, NULL, or
    * NaN weights never win (key -> -inf). Ties (identical hash draws)
    * break on the key column, making the sample unique.
    *
    * Output: the selected rows plus `es_key` (rounded to 6). One scan.
    */
  def weightedReservoir(
      df: DataFrame, keyCol: String, weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("es_key"),
      "input column 'es_key' collides with weightedReservoir's output")
    // NaN > 0.0 is TRUE in Spark (NaN sorts largest) and ln(u)/NaN is
    // NaN, which desc-sorts FIRST — without the isnan guard NaN-weight
    // garbage fills the reservoir before any real row
    val key = when(weight > 0.0 && !isnan(weight.cast("double")),
      log(hashUnit(col(keyCol))) / weight.cast("double"))
      .otherwise(lit(Double.NegativeInfinity))
    // invalid rows are FILTERED, not just sentinel-ranked: with fewer
    // than k valid rows, -Infinity sentinels (zero/NULL/NaN weight) and
    // NULL-key rows would otherwise fill the remaining reservoir slots,
    // violating the "never win" contract
    df.filter(col(keyCol).isNotNull &&
        weight.cast("double") > 0.0 && !isnan(weight.cast("double")))
      .withColumn("es_key", key)
      .orderBy(col("es_key").desc, col(keyCol).asc)
      .limit(k)
      .withColumn("es_key", round(col("es_key"), 6))
  }

  /** [[weightedReservoir]] PER GROUP: the k best Efraimidis–Spirakis
    * draws within each group — the per-language / per-source
    * quality-weighted budget ("5 docs per language, odds proportional
    * to quality") that a global reservoir cannot express. One shuffle
    * on the group key; the rank window runs per group. Adds
    * `es_rank` (1-based within the group) beside `es_key`.
    */
  def weightedReservoirPerGroup(
      df: DataFrame, groupCol: String, keyCol: String,
      weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    Seq("es_key", "es_rank").foreach { c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with weightedReservoirPerGroup's output")
    }
    val key = when(weight > 0.0 && !isnan(weight.cast("double")),
      log(hashUnit(col(keyCol))) / weight.cast("double"))
      .otherwise(lit(Double.NegativeInfinity))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("es_key").desc, col(keyCol).asc)
    // same pre-filter as weightedReservoir: a group with fewer than k
    // valid rows must emit only its valid rows, not sentinel fill
    df.filter(col(keyCol).isNotNull &&
        weight.cast("double") > 0.0 && !isnan(weight.cast("double")))
      .withColumn("es_key", key)
      .withColumn("es_rank", row_number().over(w))
      .filter(col("es_rank") <= k)
      .withColumn("es_key", round(col("es_key"), 6))
  }

  /** Token-BUDGET selection: walk rows in descending `scoreCol` order
    * (ties on the key — a total order) and keep each row whose
    * PRECEDING selection still fits `budget` tokens — "the best
    * ~1B-token subset", the fixed-compute training-set cut where
    * [[weightedReservoir]] fixes a row count instead. A row is kept
    * iff the running sum BEFORE it is under budget, so the selection
    * overshoots by at most one document (the standard knapsack-free
    * greedy; an exact fit would drop the boundary doc instead —
    * callers pick by passing a budget one doc smaller).
    *
    * Shape: one ordered window (range-partition shuffle + cumulative
    * sum) over (score, key) — the same cost as any global sort. At
    * 100 TB, pre-filter to the plausible score range first (a score
    * histogram bounds where the budget lands), so the ordered window
    * runs over a thin candidate slice, not the corpus.
    * Adds `cum_before` (tokens selected before this row). NULL scores
    * or sizes are excluded.
    */
  def selectByBudget(
      df: DataFrame, keyCol: String, scoreCol: String,
      sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains("cum_before"),
      "input column 'cum_before' collides with selectByBudget's output")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc, col(keyCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // NaN desc-sorts FIRST (before every real score), so NaN-scored
    // rows would be selected ahead of the genuine best docs and eat
    // the budget — the weightedReservoir NaN-weight hazard. Sizes get
    // the same guard: ONE NaN size poisons the cumulative sum for
    // every row after it (NaN < budget is false), silently dropping
    // the whole ranked tail; an Infinite size does the same.
    df.filter(col(scoreCol).isNotNull && col(sizeCol).isNotNull &&
        !isnan(col(scoreCol).cast("double")) &&
        !isnan(col(sizeCol).cast("double")) &&
        (abs(col(sizeCol).cast("double")) < Double.PositiveInfinity))
      .withColumn("cum_before",
        coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .filter(col("cum_before") < budget)
  }

  /** Deterministic per-group quota: keep at most `quota` rows per group,
    * chosen by the md5 hash of the key — a stable uniform shuffle WITHIN
    * each group, so the retained subset is unbiased, permanent across
    * runs/engines, and growing a group never evicts a previously kept
    * row that still ranks inside the quota. The classic use is corpus
    * balancing: cap documents per domain / language / source before
    * training.
    *
    * Adds `sample_rank` (1-based position in the group's hash order,
    * ties broken by the key itself so the rank is total) and keeps rows
    * with rank <= quota. One shuffle on the group key. At 100 TB the
    * group column is a bounded-cardinality facet (domain, lang); if one
    * group is so hot its sort spills, the two-phase remedy is the same
    * as SkewJoin's: pre-filter per (group, salt) to quota rows map-side,
    * then re-rank the <= salt*quota survivors — same answer, bounded
    * partitions.
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, keyCol: String, quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    require(!df.columns.contains("sample_rank"),
      "input column 'sample_rank' collides with capPerGroup's output column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(Text.md5Long63(col(keyCol).cast("string")), col(keyCol))
    // NULL keys hash to NULL, which ascending order sorts FIRST — they
    // would deterministically fill the quota prefix and evict real
    // rows; the keyless-rows-never-leak policy (sampleByHash) applies
    df.filter(col(keyCol).isNotNull)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
  }

  /** Proportional stratified sample: keep ceil(n_g · num/den) rows of
    * every stratum g — the "same mixture, smaller corpus" sampler
    * (where [[capPerGroup]] flattens strata to a fixed quota, this
    * PRESERVES the stratum distribution at a num/den fraction). The
    * ceiling guarantees every nonempty stratum survives, so rare
    * strata are never silently dropped.
    *
    * Selection is the md5-ranked prefix per stratum (the capPerGroup
    * recipe: permanent under reruns and engine changes); the target
    * test is pure integer arithmetic — `rank·den <= n_g·num + den−1`
    * is exactly `rank <= ceil(n_g·num/den)` for integer rank — so
    * the keep decision is bit-portable with no division anywhere.
    * The fraction arrives as an explicit rational (num, den) for the
    * same reason. One shuffle on the stratum key serves both the rank
    * and the stratum-size window; the filter is pipelined. Adds
    * `sample_rank` and `stratum_n` (the audit column for the achieved
    * per-stratum rate).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"fraction must be a rational in (0,1]: got $num/$den")
    Seq("sample_rank", "stratum_n").foreach(c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with stratifiedSample's output"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(Text.md5Long63(col(keyCol).cast("string")), col(keyCol))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
    // NULL keys would rank first and always land in the kept prefix
    // (the capPerGroup hazard) — keyless rows never leak
    df.filter(col(keyCol).isNotNull)
      .withColumn("sample_rank", row_number().over(w))
      .withColumn("stratum_n", count(lit(1)).over(wc))
      // rank is a 32-bit row_number: the product must widen to LONG or
      // a ~21M-row stratum at den=100 wraps negative and keeps
      // everything past it (stratum_n is already a long count)
      .filter(col("sample_rank").cast("long") * den <=
        col("stratum_n") * num + (den - 1))
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * md5(key) mod k, NULL keys all to fold 0 (shared with hashed
    * keys — isolate keyless rows by the key's nullness, not the
    * fold) — every row lands in exactly one of k folds, permanently
    * (reruns, engines, partitionings all agree), and fold sizes are
    * balanced in expectation. Train/validation for fold i =
    * (fold != i, fold == i); the assignment is one map-side
    * projection, so materializing all k splits costs one scan each
    * with no shuffle anywhere. Adds `fold`.
    */
  def kFolds(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in [2, 1000], got $k")
    require(!df.columns.contains("fold"),
      "input column 'fold' collides with kFolds' output")
    // NULL keys land in fold 0 by an explicit branch instead of
    // propagating NULL: a NULL fold fails BOTH `fold === i` and
    // `fold =!= i`, so such rows silently vanished from every train
    // AND validation split — the "every row lands in exactly one
    // fold" contract must hold for keyless rows too. Fold 0 is
    // SHARED, not reserved: hashed keys land there too (~1/k of
    // them), so `fold === 0` does NOT isolate keyless rows — filter
    // on the key's nullness for that. A branch, not a sentinel
    // string: any in-domain sentinel can collide with a genuine key
    // of that exact value and silently co-fold it with the NULLs.
    df.withColumn("fold",
      when(col(keyCol).isNull, lit(0L))
        .otherwise(pmod(Text.md5Long63(col(keyCol).cast("string")),
          lit(k.toLong))))
  }

  /** Temporal per-key holdout: each key's LAST `holdoutLast` events
    * (by event time, tiebroken) become the evaluation slice — the
    * leave-last-out protocol recommender/forecast eval demands, and
    * the time-respecting complement to [[leakageFreeSplit]]'s
    * cluster-aware split (that one prevents content leakage; this one
    * prevents FUTURE leakage). One window shuffle on the key; keys
    * with <= holdoutLast events land entirely in the holdout (the
    * honest convention — fabricating a train slice for them would
    * leak). Adds (recency_rank, split).
    */
  def temporalHoldout(
      df: DataFrame, keyCol: String, tsCol: String, tiebreakCol: String,
      holdoutLast: Int): DataFrame = {
    require(holdoutLast >= 1, s"holdoutLast must be >= 1, got $holdoutLast")
    Seq("recency_rank", "split").foreach(c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with temporalHoldout's output"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tiebreakCol).desc)
    // NULL timestamps have no place in a recency ordering: desc sorts
    // them LAST, so an untimed event silently ranked as its key's
    // OLDEST and landed in "train" — if it actually happened after the
    // holdout events (fresh ingest missing timestamps is the common
    // case), the training slice contains the eval slice's future,
    // exactly the leakage this protocol exists to prevent. Untimed
    // events are excluded (neither split); route them to a quarantine.
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("recency_rank", row_number().over(w))
      .withColumn("split",
        when(col("recency_rank") <= holdoutLast, lit("holdout"))
          .otherwise(lit("train")))
  }

  /** Temperature resampling: rebalance a grouped corpus (languages,
    * domains, sources) toward the flattened distribution p_g ∝ n_g^alpha
    * by keeping each row of group g with probability
    * (n_min / n_g)^(1 - alpha) — 1 for the smallest group, shrinking for
    * larger ones, so the expected kept counts follow the tempered
    * shares. The standard multilingual-mix step (alpha = 1 keeps
    * everything; alpha → 0 equalizes groups).
    *
    * The draw is [[hashUnit]] of the row key, so decisions are permanent
    * across runs/engines/partitionings. alpha = 0.5 computes the rate
    * via `sqrt`, which IEEE requires to be correctly rounded — the rate,
    * and therefore every keep decision, is bit-identical on any engine
    * (the DuckDB oracle re-derives it exactly); other alphas go through
    * `pow`, whose last-ulp wobble is documented as engine-specific.
    *
    * Scale shape: one partial-combined count per group (bounded facet
    * cardinality), the per-group rates broadcast back onto the corpus,
    * and the filter itself is map-side — no shuffle touches the data
    * rows. Adds `keep_rate`; group-count scratch columns stay internal.
    *
    * Rows with a NULL group are DROPPED (the inner rate join cannot
    * match them) — the same keyless-rows-never-leak policy as
    * [[sampleByHash]]'s NULL-key handling; facet-less rows need an
    * explicit bucket ('und', 'unknown') to participate.
    */
  def temperatureResample(
      df: DataFrame, groupCol: String, keyCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    Seq("keep_rate", "__n_grp", "__n_min").foreach { c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with temperatureResample's columns")
    }
    // NULL groups are excluded BEFORE the min: groupBy keeps the NULL
    // key, but the inner rate join below drops those rows — so a small
    // NULL-group sliver would otherwise set __n_min and silently
    // deflate every REAL group's keep_rate while contributing nothing.
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n_grp"))
    // Global min as a broadcast 1-row frame (the TfIdf.nDocs idiom):
    // keeps the operator lazy — no driver-side action — and avoids a
    // single-partition window.
    val nMin = counts.agg(min(col("__n_grp")).as("__n_min"))
    val ratio = col("__n_min").cast("double") / col("__n_grp")
    val rate =
      if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, lit(1.0 - alpha))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(groupCol), rate.as("keep_rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(hashUnit(col(keyCol)) < col("keep_rate"))
  }

  /** Deterministic contrastive negative sampling: for every anchor row,
    * emit `k` pseudo-random partner rows drawn from the whole corpus —
    * the (anchor, negative) pair generation step of contrastive
    * training prep, made permanent across runs, engines, and cluster
    * sizes.
    *
    * Shape: the corpus is reduced to one REPRESENTATIVE per hash bucket
    * (min over (md5 hash, key) — a partial-combining aggregate, ≤
    * `buckets` rows total), and each anchor derives `k` probe buckets
    * from md5(key '#' i). The pair join is then anchors×k against the
    * tiny representative table — broadcast, no shuffle ever touches the
    * corpus rows, so the operator runs at scan speed on 100 TB while a
    * naive "sample k others" needs a cross join or a global index.
    *
    * Determinism: buckets, probes, and representatives all derive from
    * md5, so DuckDB reproduces every pair bit-for-bit (`q_sample_neg`).
    * Edge semantics, identical in both engines: a probe that lands in
    * an UNOCCUPIED bucket yields no pair (w.h.p. none exist for
    * buckets ≪ corpus), a representative equal to the anchor itself is
    * dropped (no self-pairs), and NULL keys produce no pairs on either
    * side of the join.
    */
  def negativePairs(
      df: DataFrame, keyCol: String, k: Int, buckets: Int = 1024): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    Seq("neg_idx", "neg_id", "__bucket").foreach { c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with negativePairs' columns")
    }
    val key = col(keyCol)
    val reps = df
      .select(hashBucket(key, buckets).as("__bucket"),
        struct(Text.md5Long63(key.cast("string")).as("h"), key.as("k")).as("hk"))
      .groupBy(col("__bucket"))
      .agg(min(col("hk")).as("hk"))
      .select(col("__bucket"), col("hk.k").as("neg_id"))
    val probes = df
      .select(key, explode(array((1 to k).map(lit): _*)).as("neg_idx"))
      .withColumn("__bucket",
        pmod(Text.md5Long63(
          concat(key.cast("string"), lit("#"), col("neg_idx").cast("string"))),
          lit(buckets.toLong)))
    probes.join(broadcast(reps), Seq("__bucket"))
      .filter(col("neg_id") =!= key)
      .select(key, col("neg_idx"), col("neg_id"))
  }

  /** Corpus mixture materialization: resample each group (domain,
    * language, source) to a TARGET share by repeating or thinning its
    * rows — the "mixture weights -> epochs" step that turns a data-mix
    * decision (e.g. DoReMi / The-Pile-style domain weights) into an
    * actual training corpus. A group whose target share exceeds its
    * natural share repeats (multiple epochs of its docs); an
    * over-represented group thins.
    *
    * Each row's repeat factor is r_g = targetShare_g · N / n_g. The
    * row emits floor(r_g) guaranteed copies plus one more iff its
    * deterministic md5 draw (on key '#rep') falls under frac(r_g) —
    * so E[copies] = r_g exactly, every decision is a pure function of
    * (key, group sizes), and the expansion is reproducible across
    * runs, engines, and cluster sizes. r_g is doubles-only arithmetic
    * in a fixed operation order (literal · count / count, each step
    * correctly rounded), so DuckDB derives the identical factor and
    * the identical copy set.
    *
    * Output: input columns + (epoch) — epoch ∈ [0, copies) numbers
    * each copy, so downstream shuffling/packing can treat (key, epoch)
    * as the new row identity.
    *
    * Scale shape: group counts are a broadcast-sized aggregate joined
    * back broadcast; the expansion itself is a generate over each row
    * (no shuffle of the corpus). Rows whose group is missing from
    * `targetShares` are DROPPED (the mix decision enumerates what the
    * run trains on), as are NULL-group rows — same keyless-rows-never-
    * leak policy as [[sampleByHash]].
    */
  def mixtureResample(
      df: DataFrame, groupCol: String, keyCol: String,
      targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty, "targetShares must not be empty")
    targetShares.foreach { case (g, w) =>
      require(w >= 0.0, s"target share for '$g' must be >= 0, got $w")
    }
    Seq("epoch", "__n_grp", "__n_tot", "__share", "__r", "__copies").foreach { c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with mixtureResample's columns")
    }
    val shareOf = targetShares.tail.foldLeft(
      when(col(groupCol) === targetShares.head._1, lit(targetShares.head._2))) {
      case (acc, (g, w)) => acc.when(col(groupCol) === g, lit(w))
    }
    // counts over the ELIGIBLE rows only (non-NULL group AND key):
    // counting rows the join/filter below will drop distorts the
    // realized mix — a group where half the keys are NULL would emit
    // half its target share (temperatureResample excludes such rows
    // from its counts for the same reason)
    val eligible = df.filter(col(keyCol).isNotNull && col(groupCol).isNotNull)
    val counts = eligible.groupBy(col(groupCol)).agg(count(lit(1)).as("__n_grp"))
    val total = eligible.agg(count(lit(1)).as("__n_tot"))
    val rates = counts.crossJoin(broadcast(total))
      .select(col(groupCol),
        (shareOf * col("__n_tot").cast("double") /
          col("__n_grp").cast("double")).as("__r"))
      .filter(col("__r").isNotNull) // groups absent from the mix drop
    val extra = hashUnit(
      concat(col(keyCol).cast("string"), lit("#rep"))) <
      (col("__r") - floor(col("__r")))
    eligible
      .join(broadcast(rates), Seq(groupCol))
      .withColumn("__copies",
        floor(col("__r")).cast("long") + when(extra, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__r", "__copies")
  }

  /** Leakage-free train/holdout split: near-duplicate documents must
    * land on the SAME side of a split, or held-out metrics silently
    * measure memorization. Splitting on a per-doc hash
    * ([[hashSplit]]) cannot guarantee that; this variant splits on the
    * near-dup CLUSTER id — every member of a duplicate cluster shares
    * its canonical id ([[Dedup.duplicateClusters]] min-label), so the
    * whole cluster lands in one split, while singletons (the vast
    * majority) split on their own id as before.
    *
    * `pairs` is a near-duplicate pair list (doc_a, doc_b) from any of
    * the dedup pair miners. Membership remains a pure md5 function of
    * the split KEY (the cluster id), so growth only reassigns a doc if
    * new data merges its cluster — exactly the rows whose leakage
    * status actually changed.
    *
    * Scale shape: the cluster map is O(docs that have a near-dup) and
    * joins back on the id — one hash join; everything else is
    * [[hashSplit]]'s map-side projection.
    */
  def leakageFreeSplit(
      df: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int): DataFrame = {
    Seq("split_key", "cluster_id").foreach { c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with leakageFreeSplit's columns")
    }
    val clusters = Dedup.duplicateClusters(pairs)
      .withColumnRenamed("doc_id", idCol)
    val keyed = df.join(clusters, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col(idCol)))
      .drop("cluster_id")
    hashSplit(keyed, "split_key", trainPct)
  }

  /** Train/holdout split assignment: adds (bucket, split) columns with
    * `trainPct` buckets of 100 going to "train" and the rest to
    * "holdout". Membership is a pure function of the key — growing the
    * corpus never reassigns an existing row.
    */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100,
      s"trainPct must be in [0,100], got $trainPct")
    Seq("bucket", "split").foreach { c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with hashSplit's output columns")
    }
    df.withColumn("bucket", hashBucket(col(keyCol)))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train")).otherwise(lit("holdout")))
  }

  /** Deterministic sharded shuffle — the training-order materializer:
    * assigns every row a (shard, pos, global_pos) so that reading
    * shard files round-robin replays ONE fixed pseudorandom global
    * permutation of the corpus (the WebDataset/tfrecord-style sharded
    * layout LLM trainers consume).
    *
    *  - `shard`      = md5(key + "#shard") mod numShards — which file
    *                   the row lands in;
    *  - `pos`        = the row's dense 0-based rank within its shard,
    *    ordered by an INDEPENDENT md5 draw (key + "#ord"; key breaks
    *    the ~never ties) — so within-shard order is itself shuffled,
    *    not an artifact of ingest order;
    *  - `global_pos` = pos · numShards + shard — the round-robin
    *    interleave: sequential consumption across shards visits the
    *    corpus in one deterministic shuffled order, and the order is a
    *    pure function of the key set (reproducible across runs,
    *    engines, partitionings — resuming a crashed training run
    *    mid-epoch re-derives the identical sequence).
    *
    * Scale shape: shard/ord assignment is a map-side projection; the
    * only exchange is the hash partition on `shard` for the per-shard
    * rank (a window, but partitioned on the uniform md5 shard key —
    * at 100 TB pick numShards so a shard's rows fit a task, which is
    * also exactly the file size a trainer wants). NULL keys are
    * dropped (the [[sampleByHash]] keyless-rows-never-leak policy).
    * Contract: `keyCol` is unique — rows SHARING a key get identical
    * draws, so their relative `pos` is arbitrary; dedupe first.
    */
  def shardedShuffle(
      df: DataFrame, keyCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be > 0, got $numShards")
    Seq("shard", "pos", "global_pos", "__ord").foreach { c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with shardedShuffle's columns")
    }
    val keyed = df.filter(col(keyCol).isNotNull)
      .withColumn("shard", pmod(
        Text.md5Long63(concat(col(keyCol).cast("string"), lit("#shard"))),
        lit(numShards.toLong)))
      .withColumn("__ord",
        Text.md5Long63(concat(col(keyCol).cast("string"), lit("#ord"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__ord"), col(keyCol))
    keyed
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .withColumn("global_pos", col("pos") * numShards + col("shard"))
      .drop("__ord")
  }

  /** k-center greedy / farthest-point coreset over an embedding
    * corpus: pick the lowest-id vector, then repeatedly the vector
    * whose highest cosine to ANY selected vector is LOWEST (the least
    * covered point; ties to the lowest id) — the classic 2-approximate
    * k-center seeding (Gonzalez '85), used for diverse-subset
    * selection of training data and for k-means++-style seeding when
    * determinism matters more than randomization.
    *
    * Scale shape: the (id, vec, norm) projection is persisted ONCE (a
    * single source scan for the whole greedy), and the coverage column
    * is maintained INCREMENTALLY — each round folds only the newest
    * pick into the running max (`greatest(cover, cos(v, newest))`),
    * so the total work is O(n*k) cosines over cached data instead of
    * the naive O(n*k^2) re-score, and each round is one cheap
    * TakeOrderedAndProject argmin (k single-row driver round-trips
    * total — inherent to the greedy, each against cache, never the
    * source). Each pick rides the plan as one literal vector (the
    * [[KMeans]] codebook idiom); the plan grows one node per round,
    * which is why k is capped at 64 — past that,
    * [[farthestPointSampleBatched]] picks several farthest points per
    * round rather than inflating a 100-deep literal plan.
    *
    * max is associative, so the running max is bit-identical to the
    * all-pairs re-score — `q_sample_coreset`'s unrolled oracle replays
    * every round's argmin unchanged.
    *
    * Output: (sel_rank, vec id) for ranks 0..k-1 — rank 0 is the seed.
    * Arithmetic is the [[graft.functions.VectorOps]] cosine (guarded,
    * left-fold), so an external oracle replays every round's argmin.
    */
  def farthestPointSample(
      corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64,
      s"k must be in [1, 64] (plan grows one literal-vector node per " +
        s"round; batch the selection past that), got $k")
    import graft.functions.VectorOps
    import org.apache.spark.storage.StorageLevel
    // NULL ids sort FIRST ascending, so a NULL id (or a non-numeric
    // id the cast nulls) would be picked as the seed and NPE on the
    // driver's getLong; NULL vectors can't be selected or covered.
    // DEGENERATE vectors (zero norm, NULL/NaN elements) are excluded
    // with them: guardCos pins their coverage to the -2 sentinel,
    // and this operator's argmin runs ASCENDING — "least covered
    // wins" — so every corrupt row would be selected BEFORE any real
    // row (k corrupt rows = an all-garbage "diverse coreset"), and a
    // degenerate SEED would pin every row's cover at -2 and collapse
    // the sample to the k lowest ids. Unmeasurable rows are excluded,
    // not crashed on.
    val base = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"),
        VectorOps.norm(col(vecCol)).as("__n"))
      .filter(col("id").isNotNull && col("__v").isNotNull &&
        col("__n").isNotNull && !isnan(col("__n")) && col("__n") > 0.0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seedRow = base.orderBy(col("id")).limit(1)
        .select(col("id"), col("__v")).collect()
      require(seedRow.nonEmpty, "corpus is empty")
      var selected = List[(Long, Array[Float])](
        (seedRow(0).getLong(0), seedRow(0).getSeq[Float](1).toArray))
      def coverOf(sv: Array[Float]) = {
        var n = 0.0; sv.foreach(x => n += x.toDouble * x.toDouble)
        VectorOps.guardCos(try_divide(
          VectorOps.dot(col("__v"), typedlit(sv)),
          col("__n") * lit(math.sqrt(n))))
      }
      // Running max coverage vs the selected set, folded incrementally.
      // Each round's frame is persisted and the argmin job materializes
      // it from its (cached) parent, so a round computes ONE new cosine
      // per row — without the per-round persist, the lazy greatest()
      // chain would re-run every prior round's cosines and the greedy
      // would quietly be O(n*k^2) again. The grandparent is unpersisted
      // only after the argmin has materialized its child.
      var covered = base.withColumn("__cover", coverOf(selected.head._2))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var parent: Option[DataFrame] = None
      try {
        while (selected.size < k) {
          val next = covered
            .filter(!col("id").isInCollection(selected.map(_._1)))
            .select(col("id"), col("__v"), col("__cover"))
            .orderBy(col("__cover").asc, col("id").asc)
            .limit(1).collect()
          require(next.nonEmpty, s"corpus exhausted before k=$k picks")
          parent.foreach(_.unpersist())
          parent = Some(covered)
          val vec = next(0).getSeq[Float](1).toArray
          selected = selected :+ ((next(0).getLong(0), vec))
          covered = covered.withColumn("__cover",
            greatest(col("__cover"), coverOf(vec)))
            .persist(StorageLevel.MEMORY_AND_DISK)
        }
      } finally {
        parent.foreach(_.unpersist())
        covered.unpersist()
      }
      val spark = corpus.sparkSession
      import spark.implicits._
      selected.zipWithIndex
        .map { case ((id, _), r) => (r, id) }.toDF("sel_rank", "vec_id")
    } finally base.unpersist()
  }

  /** Driver round-trips a batched run pays: the seed plus one argmin
    * job per batch of picks. Exposed so the large-k job-count contract
    * is testable as arithmetic, not listener counting.
    */
  private[graft] def batchedRounds(k: Int, batch: Int): Int =
    1 + (k - 2 + batch) / batch

  /** Large-k path of [[farthestPointSample]]: each round takes the
    * `batch` LEAST-covered points (w.r.t. the cover of all PREVIOUS
    * rounds' picks) in one argmin job, then folds all of them into the
    * running max at once — driver round-trips and persisted plan
    * frames drop from k to ceil((k-1)/batch), so k=256 at batch=8 is
    * 33 jobs and 32 frames instead of 256 of each.
    *
    * Guarantee, stated honestly: picks within one round do not see
    * each other's coverage, so this is NOT the exact Gonzalez greedy
    * past batch=1 — two same-round picks may be near each other, and
    * the 2-approximation proof does not carry over verbatim. It is
    * the standard oversampling relaxation (the k-means|| idea,
    * Bahmani et al. VLDB'12: oversample per round, quality recovered
    * because later rounds cover whatever a batch over-picked).
    * batch=1 IS the exact greedy (asserted bit-equal to
    * [[farthestPointSample]] in SamplingSpec); callers who need the
    * proof use that, callers who need k in the hundreds trade it for
    * k/batch round-trips.
    *
    * Ranks within a round follow the same (cover asc, id asc) order
    * the argmin returned, so output ranks are deterministic.
    */
  def farthestPointSampleBatched(
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      batch: Int = 8): DataFrame = {
    require(batch >= 1 && batch <= 64, s"batch must be in [1, 64], got $batch")
    require(k >= 1 && k <= 1024,
      s"k must be in [1, 1024] (ceil((k-1)/batch) persisted plan frames), got $k")
    require(k == 1 || batchedRounds(k, batch) <= 65,
      s"k=$k at batch=$batch needs ${batchedRounds(k, batch)} rounds; " +
        "raise batch so rounds stay <= 65")
    import graft.functions.VectorOps
    import org.apache.spark.storage.StorageLevel
    // NULL ids sort FIRST ascending, so a NULL id (or a non-numeric
    // id the cast nulls) would be picked as the seed and NPE on the
    // driver's getLong; NULL vectors can't be selected or covered.
    // DEGENERATE vectors (zero norm, NULL/NaN elements) are excluded
    // with them: guardCos pins their coverage to the -2 sentinel,
    // and this operator's argmin runs ASCENDING — "least covered
    // wins" — so every corrupt row would be selected BEFORE any real
    // row (k corrupt rows = an all-garbage "diverse coreset"), and a
    // degenerate SEED would pin every row's cover at -2 and collapse
    // the sample to the k lowest ids. Unmeasurable rows are excluded,
    // not crashed on.
    val base = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"),
        VectorOps.norm(col(vecCol)).as("__n"))
      .filter(col("id").isNotNull && col("__v").isNotNull &&
        col("__n").isNotNull && !isnan(col("__n")) && col("__n") > 0.0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val seedRow = base.orderBy(col("id")).limit(1)
        .select(col("id"), col("__v")).collect()
      require(seedRow.nonEmpty, "corpus is empty")
      var selected = List[(Long, Array[Float])](
        (seedRow(0).getLong(0), seedRow(0).getSeq[Float](1).toArray))
      def coverOf(sv: Array[Float]) = {
        var n = 0.0; sv.foreach(x => n += x.toDouble * x.toDouble)
        VectorOps.guardCos(try_divide(
          VectorOps.dot(col("__v"), typedlit(sv)),
          col("__n") * lit(math.sqrt(n))))
      }
      val spark0 = corpus.sparkSession
      var covered = base.withColumn("__cover", coverOf(selected.head._2))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var parent: Option[DataFrame] = None
      try {
        while (selected.size < k) {
          val want = math.min(batch, k - selected.size)
          val next = covered
            .filter(!col("id").isInCollection(selected.map(_._1)))
            .select(col("id"), col("__v"), col("__cover"))
            .orderBy(col("__cover").asc, col("id").asc)
            .limit(want).collect()
          require(next.length == want,
            s"corpus exhausted before k=$k picks (got ${selected.size + next.length})")
          parent.foreach(_.unpersist())
          parent = Some(covered)
          // Constant-size per-round plan: re-expose the just-
          // materialized cache through an RDD boundary (the
          // Reachability lineage-flattening idiom) BEFORE chaining the
          // next projection. Without this each round's logical plan
          // embeds every prior round's, and analysis + codegen cost
          // grows with rounds until a k=256 run OOMs the driver —
          // measured, and exactly the failure the batched variant
          // exists to avoid. Execution-neutral: the RDD reads the
          // cached frame, arithmetic unchanged (oracle re-verified).
          val flat = spark0.createDataFrame(covered.rdd, covered.schema)
          val picks = next.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          selected = selected ++ picks
          // one frame folds the whole batch: greatest() over the prior
          // cover and every new pick's cosine, all in one projection
          covered = flat.withColumn("__cover",
            greatest(col("__cover") +: picks.map(p => coverOf(p._2)): _*))
            .persist(StorageLevel.MEMORY_AND_DISK)
        }
      } finally {
        parent.foreach(_.unpersist())
        covered.unpersist()
      }
      val spark = corpus.sparkSession
      import spark.implicits._
      selected.zipWithIndex
        .map { case ((id, _), r) => (r, id) }.toDF("sel_rank", "vec_id")
    } finally base.unpersist()
  }
}
