package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Within-document repetition signals in the Gopher/MassiveText style:
  * heavily self-repeating documents (boilerplate, listings, SEO spam)
  * are a distinct failure mode from cross-document duplication, and
  * training pipelines filter on the fraction of the text consumed by
  * repeated n-grams.
  *
  * The per-document counting runs through the AGGREGATION engine —
  * explode n-grams to rows, two codegen'd HashAggregates with map-side
  * partial combine — for the same reason the MinHash/SimHash signatures
  * do (see `Dedup.minhashColumns`): a Column-expression histogram over
  * the gram array would be O(g²) per row and fall out of whole-stage
  * codegen. The shuffle key is (doc_id, gram) then doc_id — uniform by
  * construction, so the shape holds at 100 TB.
  */
object Repetition {

  /** Token-distribution diversity per document:
    *
    *  - `n_tokens` / `n_types`  total and distinct token counts
    *  - `simpson`   Simpson concentration Σ(c_i/t)² — 1/t for fully
    *                diverse text, → 1 for one-token spam. RATIONAL in
    *                the counts (Σc² and t² are exact integers, one
    *                double division), so the value is bit-identical on
    *                any engine — the oracle-checkable diversity score.
    *  - `entropy`   Shannon entropy (bits). log2's last ulp differs
    *                across libm implementations, so this column is the
    *                library-grade signal (unit-tested against a driver
    *                computation) while `simpson` carries the
    *                cross-engine contract.
    *
    * Same aggregation-engine shape as [[repetitionStats]]: explode →
    * two partially-combined aggregates keyed (doc, token) then doc.
    * A NULL-text doc has no token distribution and is absent from the
    * output (explode of a null array emits nothing — and external
    * engines' unnest agrees, which keeps the oracle aligned); empty
    * text is one empty-string token, not a null.
    */
  def tokenDiversity(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("t"),
      count(lit(1)).as("types"),
      sum(col("cnt") * col("cnt")).as("c2"),
      sum(col("cnt").cast("double") * log2(col("cnt").cast("double"))).as("clc"))
      .select(
        col("doc_id"),
        col("t").cast("int").as("n_tokens"),
        col("types").cast("int").as("n_types"),
        // portableRound6, not round: Σc²/t² is an integer ratio whose
        // denominator is a SQUARE — v2(t²) reaches 7+ at t = 80-style
        // token counts (2^8·5^2), putting a non-dyadic .5e-6 boundary
        // in reach of real docs; the floor-chain round removes the
        // engine tie-convention from the contract entirely (see Num)
        graft.functions.Num.portableRound6(
          col("c2").cast("double") / (col("t") * col("t"))).as("simpson"),
        round(log2(col("t").cast("double")) - col("clc") / col("t"), 6)
          .as("entropy"))
  }

  /** Shared core of [[dupSpanStats]] and [[removeDupSpans]]: the
    * positional gram stream, the corpus-hot gram set (document
    * frequency >= minDf over DISTINCT (doc, gram)), and the distinct
    * 1-based token positions each doc has covered by a hot gram — one
    * definition, so a position-convention or df fix cannot
    * desynchronize the diagnostic from the rewrite it documents.
    * posexplode index i is 0-based; gram i starts at token position
    * i+1 and covers positions i+1 .. i+n (1-based).
    */
  private def hotCoveredPositions(
      docs: DataFrame, n: Int, minDf: Int): DataFrame = {
    val grams = docs.select(col("doc_id"),
      posexplode(Text.ngrams(col("text"), n)).as(Seq("p0", "gram")))
      .select(col("doc_id"), col("p0"), Text.md5Long63(col("gram")).as("gh"))
    val hot = grams.select(col("doc_id"), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("gh"))
    grams.join(hot, Seq("gh"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("p0") + 1, col("p0") + n)).as("pos"))
      .distinct()
  }

  /** CROSS-document duplicated-span coverage — the diagnostic behind
    * exact-substring dedup (the "dedup training data makes LMs better"
    * screen): for each document, the fraction of its token positions
    * covered by at least one word n-gram whose corpus document
    * frequency is >= `minDf`. A doc scoring high is mostly made of
    * text that recurs across the corpus (mirrors, boilerplate,
    * templated spam) even when no single whole-doc or chunk hash
    * matches. Positions (not gram counts) are what's measured: two
    * overlapping hot n-grams cover n+1 positions, not 2n, so the score
    * is a true "share of the text" in [0, 1].
    *
    * Scale shape: positional grams are a map-side generate; the
    * document-frequency pass and the hot semi join both key on the
    * 63-bit md5 gram hash ([[graft.functions.Text.md5Long63]]) — the
    * gram strings never shuffle, and the df>=minDf filter bounds the
    * hot side by the recurring vocabulary. Covered positions dedup in
    * one partial-combined distinct before the per-doc count. Docs
    * shorter than n tokens have no grams and score 0 via the left
    * join, not by dropping out.
    */
  def dupSpanStats(docs: DataFrame, n: Int, minDf: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val covered = hotCoveredPositions(docs, n, minDf)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("cov"))
    docs.select(col("doc_id"), Text.tokenCount(col("text")).as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("cov"), lit(0L)).cast("int").as("covered_tokens"),
        // portableRound6 (r11 triage): cov/n_tokens is an integer
        // ratio over the doc's token count — <= 100 in the shipped
        // testdata, unbounded for a real corpus, where the divergent
        // 640-family denominator is reachable. Oracle in lockstep.
        coalesce(graft.functions.Num.portableRound6(
            col("cov").cast("double") / col("n_tokens")), lit(0.0))
          .as("dup_span_frac"))
  }

  /** Substring-granularity dedup REWRITE — the action behind
    * [[dupSpanStats]] (the "deduplicating training data" recipe at
    * span level): drop every token position covered by a corpus-hot
    * n-gram and reassemble the survivors in order, keeping the
    * documents themselves. Whole-doc and chunk dedup can only keep or
    * kill; this removes the mirrored boilerplate from otherwise-unique
    * documents — the highest-value tier of a 100 TB dedup pass.
    *
    * Output: (doc_id, clean_text, n_removed). A fully-covered doc
    * keeps a row with empty text (the caller decides whether empties
    * survive); a doc with no grams (or no hot grams) passes through
    * byte-identical.
    *
    * Scale shape: [[dupSpanStats]]'s bounded hot set and position
    * dedup, plus one token-stream anti join on (doc, pos) and one
    * per-doc reassembly aggregate (sorted inside the aggregate — no
    * window). Reassembly concatenates only SURVIVING tokens, so the
    * width of the agg state is bounded by the doc itself.
    */
  def removeDupSpans(docs: DataFrame, n: Int, minDf: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    // NULL-text docs are EXCLUDED, not rewritten: the left-join
    // coalesce below would emit clean_text = '' with n_removed = NULL
    // for them — indistinguishable from a genuinely fully-covered doc
    // (silent NULL→'' coercion) and NULL arithmetic downstream. The
    // tokenDiversity convention: no text, no row.
    val present = docs.filter(col("text").isNotNull)
    val covered = hotCoveredPositions(present, n, minDf)
    val kept = present
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    present.select(col("doc_id"), Text.tokenCount(col("text")).as("nt"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("nt") - coalesce(col("n_kept"), lit(0L))).cast("int").as("n_removed"))
  }

  /** Per-document n-gram repetition stats:
    *
    *  - `n_grams`        total n-grams (with multiplicity)
    *  - `n_unique_grams` distinct n-grams
    *  - `top_gram_frac`  fraction consumed by the single most frequent
    *                     n-gram
    *  - `dup_gram_frac`  fraction consumed by n-grams occurring more
    *                     than once (the Gopher "duplicate n-gram
    *                     fraction")
    *
    * Documents shorter than n tokens keep a row with zeroed stats (a
    * LEFT join back to the id set — the explode path drops them).
    */
  def repetitionStats(docs: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val counts = docs
      .select(col("doc_id"), explode(Text.ngrams(col("text"), n)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val agg = counts.groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("total"),
      count(lit(1)).as("uniq"),
      max(col("cnt")).as("mx"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L))).as("dup"))
    // distinct spine (the oovRate/vocabGrowth convention — whose
    // comments cite THIS operator for it): duplicate doc_id input rows
    // would emit each doc's stats row once per duplicate and
    // double-weight it in any downstream corpus-level average
    docs.select(col("doc_id")).distinct().join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("total"), lit(0L)).cast("int").as("n_grams"),
        coalesce(col("uniq"), lit(0L)).cast("int").as("n_unique_grams"),
        // portableRound6 (r11 triage): mx/total and dup/total are
        // integer ratios over the doc's gram count — unbounded in a
        // real corpus (the dupSpanStats rationale). Oracle in lockstep.
        coalesce(graft.functions.Num.portableRound6(
            col("mx").cast("double") / col("total")), lit(0.0))
          .as("top_gram_frac"),
        coalesce(graft.functions.Num.portableRound6(
            col("dup").cast("double") / col("total")), lit(0.0))
          .as("dup_gram_frac"))
  }
}
