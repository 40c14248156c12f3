package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-statistics-weighted term scoring: the top-k characteristic
  * terms per document by tf·idf — keyword extraction / topic tagging
  * over a training corpus.
  *
  * idf is the RATIONAL variant N/df, not ln(N/df), deliberately: tf, N
  * and df are integer-valued, so tf·N/df is a single IEEE division any
  * engine computes bit-identically, while ln's last-ulp wobble across
  * libm implementations would make cross-engine parity flaky. For a
  * FIXED term the two rank documents identically (both monotone in tf);
  * across terms the rational variant weighs rarity more steeply — fine
  * for top-k extraction, and documented as the contract.
  *
  * Scale shape: tf = groupBy(doc, term) and df = groupBy(term) both
  * partial-aggregate map-side before their shuffle, so the Zipf head
  * ("the" in every task) collapses to one row per partition before the
  * exchange. The tf⋈df join matches each tf row against exactly one
  * vocab row — no fan-out; the term key is Zipf-skewed in ROW count,
  * which AQE's skew-join splitting absorbs (the build rows stay one per
  * key regardless). The doc count joins in as a broadcast 1-row frame,
  * keeping the whole operator lazy — no driver-side count() action.
  */
object TfIdf {

  /** Output: (doc_id, term, score, term_rank), `k` rows per document,
    * rank ordered by (score desc, term) — total and deterministic.
    */
  def topTerms(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val toks = docs.select(col("doc_id"),
      explode(Text.nonEmptyTokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df derives from tf (one row per distinct (doc, term) already) —
    // NOT from a second tokenize+explode+distinct over the corpus,
    // which would scan everything twice and add a distinct exchange.
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        // portableRound6: tf·N/df is an integer ratio over an unbounded
        // document frequency — the .5e-6 tie class (see Num)
        graft.functions.Num.portableRound6(
          col("tf") * col("n_docs").cast("double") / col("df")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("term_rank"))
  }

  /** Corpus-wide vocabulary statistics: the `k` most frequent word
    * n-grams with their total occurrence count and document frequency —
    * the inspection step before choosing stopword lists, tokenizer
    * merges, or boilerplate filters for a training corpus.
    *
    * Scale shape: explode → ONE codegen'd HashAggregate on the gram (the
    * (gram, doc) document-frequency side piggybacks as
    * `count distinct`-free two-level agg), partial map-side combine
    * collapses the Zipf head before the exchange, and the final top-k is
    * a `TakeOrderedAndProject` — k rows per partition cross the wire,
    * never the vocabulary. Output: (gram, n_occurrences, n_docs),
    * ordered (n_occurrences desc, gram) — total and deterministic.
    */
  def corpusTopNgrams(docs: DataFrame, n: Int, k: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(k > 0, s"k must be positive, got $k")
    docs
      .select(col("doc_id"), explode(Text.ngrams(col("text"), n)).as("gram"))
      .groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("gram"))
      .agg(sum(col("cnt")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("gram"))
      .limit(k)
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabSize` unigram vocabulary — the tokenizer-coverage
    * diagnostic (how much of each document a fixed vocab fails to
    * cover; the rate spikes on exactly the documents a subword
    * tokenizer will fragment). Vocabulary selection is deterministic:
    * count descending, token ascending on ties.
    *
    * Scale shape: the vocabulary is a TakeOrderedAndProject over a
    * partially-combined token aggregate (vocabSize rows per partition
    * cross the wire, never the full vocabulary) and then BROADCASTS
    * into the membership join — the token stream itself is shuffled
    * once, on doc_id, for the per-doc aggregate. To score against an
    * EXTERNAL tokenizer vocab, substitute that table for the derived
    * one — identical plan.
    */
  def oovRate(docs: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val toks = docs.select(col("doc_id"),
      explode(Text.nonEmptyTokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("__in_vocab"))
    val perDoc = toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
    // left-join the DOC SPINE back (the vocabGrowth/repetitionStats
    // convention): a tokenless (blank/NULL-text) doc explodes to no
    // rows and would vanish from the output entirely — coverage
    // accounting then undercounts the corpus. Such docs read
    // (0, 0, NULL rate) instead of disappearing.
    docs.select(col("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(try_divide(col("n_oov").cast("double"),
          col("n_tokens").cast("double")), 6))
  }
  /** Heaps'-law vocabulary growth curve: cumulative token count vs
    * cumulative DISTINCT vocabulary size at every `every`-th document
    * in id order — the "is the corpus still teaching new words?"
    * saturation diagnostic behind crawl-more vs dedup-harder calls.
    *
    * Each token's first-introducing document is one min-aggregate over
    * the (token, doc) pairs (vocabulary-bounded — the corpus text
    * never re-shuffles); new-word counts then fold over the per-doc
    * spine with an ordered cumulative window. That window is global
    * but runs over ONE aggregated row per document, not data rows; for
    * corpora where even the doc spine outgrows a partition, the
    * standard two-pass distributed prefix sum (per-partition totals +
    * broadcast offsets) drops in without changing the contract.
    * Output per checkpoint: (n_docs, doc_id, cum_tokens, cum_vocab,
    * vocab_rate) where vocab_rate = cum_vocab / cum_tokens.
    */
  def vocabGrowth(docs: DataFrame, every: Int): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val tok = docs.select(col("doc_id").as("__id"),
      explode(Text.nonEmptyTokens(col("text"))).as("__tok"))
    // the doc SPINE comes from the docs table, not the exploded
    // tokens: a tokenless (empty/blank) document contributes 0 tokens
    // but still occupies a position in the corpus sequence — deriving
    // the spine from tokens silently dropped such docs, so n_docs and
    // the every-th checkpoints misaligned with the actual corpus
    val perDoc = docs.select(col("doc_id").as("__id")).distinct()
      .join(tok.groupBy(col("__id")).agg(count(lit(1)).as("__ntok0")),
        Seq("__id"), "left")
      .select(col("__id"), coalesce(col("__ntok0"), lit(0L)).as("__ntok"))
    val firstDoc = tok.groupBy(col("__tok")).agg(min(col("__id")).as("__fd"))
    val newPerDoc = firstDoc.groupBy(col("__fd").as("__id"))
      .agg(count(lit(1)).as("__nnew"))
    val wCum = Window.orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wRank = Window.orderBy(col("__id"))
    perDoc.join(newPerDoc, Seq("__id"), "left")
      .withColumn("__nnew2", coalesce(col("__nnew"), lit(0L)))
      .withColumn("cum_tokens", sum(col("__ntok")).over(wCum))
      .withColumn("cum_vocab", sum(col("__nnew2")).over(wCum))
      .withColumn("__rk", row_number().over(wRank))
      .filter(col("__rk") % every === 0)
      .select(col("__rk").as("n_docs"), col("__id").as("doc_id"),
        col("cum_tokens"), col("cum_vocab"),
        // try_divide: a checkpoint before the first real token
        // (leading blank docs) is 0/0 — plain double division reads
        // NaN, which poisons downstream sorts; the house rule is NULL
        // portableRound6: integer ratio over the growing corpus
        // token total — the .5e-6 tie class (see Num)
        graft.functions.Num.portableRound6(
          try_divide(col("cum_vocab").cast("double"),
            col("cum_tokens").cast("double"))).as("vocab_rate"))
      .orderBy(col("doc_id"))
  }

  /** Per-document lexical novelty against everything EARLIER in id
    * order: the share of a document's distinct tokens whose first
    * corpus occurrence is this document. Low novelty late in a crawl
    * = the new drop is re-treading old ground — the document-granular
    * companion to `vocabGrowth`'s corpus curve (and a cheap
    * near-duplicate tripwire that needs no pair mining).
    *
    * Same vocabulary-bounded shape: distinct (token, doc) pairs, one
    * min-aggregate for each token's introducing doc, one equi-join
    * back (token-keyed — vocabulary-sized build side), one per-doc
    * count. Nothing all-pairs, nothing ordered over data rows.
    * Output: (doc_id, n_distinct_tokens, n_novel, novelty).
    */
  def noveltyRates(docs: DataFrame): DataFrame = {
    val grams = docs.select(col("doc_id").as("__id"),
      explode(Text.nonEmptyTokens(col("text"))).as("__tok")).distinct()
    val firstDoc = grams.groupBy(col("__tok")).agg(min(col("__id")).as("__fd"))
    val perDoc = grams.join(firstDoc, Seq("__tok"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_distinct_tokens"),
        sum(when(col("__fd") === col("__id"), 1L).otherwise(0L))
          .as("n_novel"))
    // doc spine (the oovRate/vocabGrowth convention): a blank or
    // NULL-text doc explodes to zero rows and would VANISH from the
    // output — a caller joining novelty back onto the corpus loses it
    // with no NULL-novelty row to see. Tokenless docs read (0, 0,
    // NULL): no tokens, no novelty measurement.
    docs.select(col("doc_id").as("__id")).distinct()
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as("doc_id"),
        coalesce(col("n_distinct_tokens"), lit(0L)).as("n_distinct_tokens"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(try_divide(col("n_novel").cast("double"),
          col("n_distinct_tokens").cast("double")), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }
  /** Okapi BM25 scoring of the corpus against a fixed query-term set —
    * the classic lexical retrieval scorer (the baseline every
    * embedding retriever is judged against, and the hybrid-search
    * partner next to the ANN tier). Standard formulation:
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`.
    *
    * Scale shape: document length and corpus stats come from one
    * partial-combined aggregate (a 1-row broadcast); term frequencies
    * touch only rows matching the query terms (the filter is map-side
    * against a literal set, so the corpus scan prunes BEFORE any
    * shuffle); df is an aggregate over the bounded (doc, term) match
    * table. Nothing joins all-pairs.
    *
    * Portability: tf/df/dl/N are exact integers; avgdl is one IEEE
    * division; each per-term partial is a fixed chain of IEEE steps
    * (ln via libm — the MI/PSI-established contract); per-doc partials
    * fold in term-sorted order through the collected (bounded) term
    * array, then round 6. Output: (doc_id, dl, n_matched, score) for
    * docs matching at least one term.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double, b: Double): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "bm25 needs a nonempty set of distinct query terms")
    // out-of-range hyperparameters don't error downstream — they
    // silently INVERT scores: a negative k1 flips the saturation
    // denominator negative for small tf (or crosses zero into an
    // IEEE Infinity), partially reversing the ranking
    require(k1 >= 0.0, s"k1 must be >= 0 (BM25 saturation), got $k1")
    require(b >= 0.0 && b <= 1.0,
      s"b must be in [0, 1] (length-normalization mix), got $b")
    val tok = docs.select(col("doc_id").as("__id"),
      explode(Text.nonEmptyTokens(col("text"))).as("__tok"))
    val dl = tok.groupBy(col("__id")).agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("__n"),
      sum(col("dl")).as("__sumdl"))
    val tf = tok.filter(col("__tok").isin(terms: _*))
      .groupBy(col("__id"), col("__tok")).agg(count(lit(1)).as("__tf"))
    val df_ = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val partials = tf
      .join(broadcast(df_), Seq("__tok"))
      .join(dl, Seq("__id"))
      .crossJoin(broadcast(corpus))
      .select(col("__id"), col("__tok"), col("dl"), {
        val idf = log(lit(1.0)
          + (col("__n").cast("double") - col("__df").cast("double") + 0.5)
            / (col("__df").cast("double") + 0.5))
        val dlNorm = col("dl").cast("double") *
          (col("__n").cast("double") / col("__sumdl").cast("double"))
        val sat = (col("__tf").cast("double") * lit(k1 + 1.0)) /
          (col("__tf").cast("double")
            + lit(k1) * (lit(1.0 - b) + lit(b) * dlNorm))
        (idf * sat).as("__p")
      })
    partials
      .groupBy(col("__id"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("n_matched"),
        sort_array(collect_list(struct(col("__tok"), col("__p"))))
          .as("__terms"))
      .select(col("__id").as("doc_id"), col("dl"), col("n_matched"),
        round(aggregate(col("__terms"), lit(0.0),
          (acc, t) => acc + t.getField("__p")), 6).as("score"))
  }
}
