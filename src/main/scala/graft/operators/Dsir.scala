package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Text

/** Data selection via hashed-feature importance weighting — the DSIR
  * recipe (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): score every corpus document by how much
  * its hashed bag-of-tokens looks like a TARGET distribution relative
  * to the corpus itself, then keep the highest-affinity slice. This is
  * the standard way a 100 TB web crawl gets steered toward a
  * high-quality / in-domain target (Wikipedia, books, a curated
  * eval-adjacent set) without training a classifier.
  *
  * Feature space: tokens hash into `buckets` ids via the md5-derived
  * 63-bit hash ([[Text.md5Long63]] — the one hash every engine
  * shares), so the whole featurizer is engine-portable and the DuckDB
  * oracle re-derives identical bucket ids, counts, and scores.
  *
  * Scoring (portable variant): the paper scores log p_target(x) -
  * log p_source(x) = Σ_f c_f · log(p̂_t(f)/p̂_s(f)). Natural log is
  * libm-dependent — engines legitimately disagree in the last ulp —
  * so the portable score uses the smoothed ratio itself:
  *
  *   ratio_b = ((t_b + 1) · (S + B)) / ((s_b + 1) · (T + B))
  *
  * (t_b/s_b = target/source counts of bucket b, T/S totals, B buckets
  * — i.e. p̂_t(b)/p̂_s(b) with add-one smoothing). The integer
  * products stay < 2^53 (exact as doubles) and the single division is
  * correctly rounded, so every engine computes the identical double;
  * it is then quantized to 6 places and summed EXACTLY (decimal), so
  * the per-doc score is shuffle-order independent. The score is the
  * count-weighted MEAN ratio — monotone in the same direction as the
  * paper's mean log-ratio for ranking purposes, and bit-reproducible.
  *
  * Scale shape: ONE (doc, bucket) count aggregate over the corpus —
  * the B-row source distribution and both totals roll up from it (the
  * target side likewise aggregates once) — then one broadcast join
  * and one per-doc sum. The corpus is tokenized once, shuffled only on
  * its own (doc, bucket) keys, never joined against itself, and the
  * bucket tables are O(B) regardless of corpus size.
  */
object Dsir {

  /** Per-document target-affinity scores.
    *
    * Returns (idCol, n_tokens, dsir_score): `dsir_score` is the
    * count-weighted mean smoothed target/source bucket ratio — > 1
    * means the document's vocabulary is over-represented in `target`
    * relative to the corpus, < 1 under-represented.
    *
    * `target` needs only a text column with the same name; it is
    * typically a small curated set (broadcast-sized aggregate either
    * way — only its B-row bucket distribution survives).
    */
  def importanceScores(
      corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // an EMPTY target (bad path, over-filtered upstream) would make
    // every smoothed ratio NULL and a downstream selectByScore
    // silently select NOTHING from a 100 TB corpus — the target is
    // the small side by contract, so the eager probe is cheap.
    // NULL-text rows on either side contribute no tokens (explode of
    // a NULL token array emits nothing), like chunkByTokens.
    require(!target.filter(col(textCol).isNotNull).isEmpty,
      "DSIR target has no non-null text — importance ratios would all " +
        "be NULL and selection would silently return nothing")
    Seq("n_tokens", "dsir_score", "__bkt", "__cnt", "__ratio").foreach { c =>
      require(!corpus.columns.contains(c),
        s"input column '$c' collides with importanceScores' columns")
    }
    def bucketed(df: DataFrame): DataFrame =
      df.select(col(idCol),
        // nonEmptyTokens, not tokens: a ''-artifact from consecutive
        // spaces must never become a scored hash bucket or count into
        // n_tokens (Text.scala's own term-level contract; TfIdf and
        // LangModel already follow it) — whitespace messiness differs
        // sharply between web corpora and curated targets, so the ''
        // bucket systematically distorted exactly the affinity signal
        // this operator scores
        explode(Text.nonEmptyTokens(col(textCol))).as("__tok"))
        .select(col(idCol),
          pmod(Text.md5Long63(col("__tok")), lit(buckets.toLong)).as("__bkt"))

    // NULL ids never leak (the Features.hashedFeatures policy): the
    // groupBy below would otherwise collate EVERY keyless corpus row
    // into one merged pseudo-document whose blended score can clear a
    // selection cutoff — a garbage mega-document selected silently
    val corpusBuckets = bucketed(corpus.filter(col(idCol).isNotNull))
    // only the target's bucket DISTRIBUTION survives — selecting idCol
    // would both crash an id-less curated target (the documented
    // "needs only a text column" contract) and be dead weight
    val targetBuckets = target
      .select(explode(Text.nonEmptyTokens(col(textCol))).as("__tok"))
      .select(pmod(Text.md5Long63(col("__tok")), lit(buckets.toLong)).as("__bkt"))

    // ONE corpus-side aggregate: the per-(doc, bucket) counts. The
    // B-row source distribution and the 1-row totals both roll up from
    // it (and the target total from the target distribution) instead
    // of re-scanning the inputs — the corpus is tokenized and shuffled
    // exactly once, its exchange reused by the final per-doc join.
    val docCounts = corpusBuckets
      .groupBy(col(idCol), col("__bkt")).agg(count(lit(1)).as("__cnt"))
    val src = docCounts.groupBy(col("__bkt")).agg(sum(col("__cnt")).as("__scnt"))
    val tgt = targetBuckets.groupBy(col("__bkt")).agg(count(lit(1)).as("__tcnt"))
    val totals = src.agg(sum(col("__scnt")).as("__stot"))
      .crossJoin(tgt.agg(sum(col("__tcnt")).as("__ttot")))

    // Smoothed ratio per bucket, exactly rounded then 6-place quantized
    // (see object doc). Buckets absent from the corpus cannot appear in
    // any corpus document, so the left join from src covers everything.
    // CEILING: the long products below stay exact (and the double cast
    // correctly rounded) only while (t_b+1)·(stot+B) and
    // (s_b+1)·(ttot+B) are < 2^53 — roughly corpus·target token
    // products under ~9e15. Past that the cross-engine bit-parity
    // claim softens to last-ulp agreement, and past 2^63 the product
    // overflows outright (ANSI: job error); at that scale compute the
    // ratio as ln-difference of per-side doubles instead.
    val b = lit(buckets.toLong)
    // portableRound6 (not round) here and on the final mean: the
    // smoothed quotient can land within an ulp of a .5e-6 boundary,
    // where engines' ROUND tie conventions diverge (Num's doc)
    val ratio = graft.functions.Num.portableRound6(
      ((coalesce(col("__tcnt"), lit(0L)) + lit(1L)) * (col("__stot") + b))
        .cast("double") /
        ((col("__scnt") + lit(1L)) * (col("__ttot") + b)).cast("double"))
    val bucketScores = src.join(tgt, Seq("__bkt"), "left")
      .crossJoin(broadcast(totals))
      .select(col("__bkt"), ratio.cast(DecimalType(28, 6)).as("__ratio"))

    // Per-(doc, bucket) counts -> count-weighted exact-decimal mean.
    docCounts
      .join(broadcast(bucketScores), Seq("__bkt"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__cnt")).as("n_tokens"),
        // portableRound6, not round: the weighted mean can land within
        // an ulp of a .5e-6 boundary, where engines' ROUND tie
        // conventions diverge (the r9 sf0.1 q_sample_dsir incident —
        // three boundary rows; mechanism in Num's doc)
        graft.functions.Num.portableRound6(
          sum(col("__cnt") * col("__ratio")).cast("double") /
            sum(col("__cnt")).cast("double")).as("dsir_score"))
  }

  /** The selection step: keep documents whose score clears `cutoff` —
    * a pure map-side filter over the scored frame (the paper resamples
    * proportionally to the weights; a deterministic pipeline wants the
    * cutoff form, and [[Sampling.sampleByWeight]] supplies the
    * proportional form when wanted: pass the score, clamped to [0,1],
    * as the weight).
    */
  def selectByScore(scored: DataFrame, cutoff: Double): DataFrame =
    scored.filter(col("dsir_score") >= cutoff)
}
