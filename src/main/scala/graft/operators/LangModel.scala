package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-trained bigram language model for perplexity-proxy quality
  * scoring — the CCNet/Gopher-style "score every document by a small
  * LM trained on (a slice of) the corpus itself" filter, the standard
  * third quality channel next to heuristic flags and classifier
  * scores.
  *
  * Scale shape:
  *
  *  - TRAIN is two exact count aggregations (unigrams, then bigrams
  *    restricted to the retained vocabulary), each one shuffle with
  *    map-side partial combine, followed by a bounded
  *    `orderBy(cnt desc, token).limit(V)` top-V — a
  *    TakeOrderedAndProject, so only V rows ever reach the driver.
  *    The pruned model (vocabSize + bigramSize entries, a few thousand
  *    total) is a MODEL, not data: it rides the scoring plan as two
  *    literal maps plus a scalar (the codebook idiom —
  *    [[Similarity.loadCodebook]]).
  *  - SCORE is one map-side pass: each document's bigram list is built
  *    with array HOFs (no explode, no shuffle), each bigram looks up
  *    the literal maps, and the per-document log-probability is a
  *    deterministic LEFT FOLD over the array (`aggregate`) — never a
  *    row-level SUM whose shuffle order could perturb the IEEE total.
  *    The only shuffle in a full scoring run is whatever the caller
  *    aggregates afterwards.
  *
  * Probability model (stupid backoff, Brants et al. '07 — the
  * industry-standard pruned-LM scoring scheme because it needs no
  * discounting state): for a bigram (w1, w2)
  *
  *  - retained bigram:        ln( c(w1,w2) / c(w1) )
  *  - else w2 in vocabulary:  ln( alpha * c(w2) / N )
  *  - else (OOV):             ln( alpha / N )  — one-count floor
  *
  * averaged over the document's (n_tokens - 1) bigrams; a document
  * with fewer than 2 tokens scores NULL (`try_divide`). All counts are
  * exact integers and every quotient is a single IEEE division inside
  * the fold, so a DuckDB oracle replays the model and the scores
  * bit-for-bit (ROUND(x, 6) applied after the final division on both
  * sides — the project-wide portability kernel).
  *
  * Determinism contract: like [[HeavyHitters.heavyHitters]], training
  * scans `docs` twice (unigrams, bigrams) — the input must be
  * re-evaluation-stable (no `sample()`/`rand()`; persist such inputs
  * first). Ties in the top-V / top-B cuts break on ascending token
  * text, making the retained model unique.
  */
object LangModel {

  /** Pruned bigram model: token -> count, "w1 w2" -> count, corpus
    * token total. Bigram keys join on a single space — tokens come
    * from the space-splitting tokenizer, so the separator cannot occur
    * inside a token.
    */
  final case class BigramModel(
      unigrams: Map[String, Long],
      bigrams: Map[String, Long],
      totalTokens: Long)

  /** Train a pruned model over `textCol`. Empty tokens (from repeated
    * separators) are dropped. vocabSize/bigramSize are capped at 8192
    * — the model must stay a broadcastable literal.
    */
  def train(
      docs: DataFrame, textCol: String,
      vocabSize: Int = 1000, bigramSize: Int = 4000): BigramModel = {
    require(vocabSize >= 1 && vocabSize <= 8192,
      s"vocabSize must be in [1, 8192], got $vocabSize")
    require(bigramSize >= 1 && bigramSize <= 8192,
      s"bigramSize must be in [1, 8192], got $bigramSize")
    val toks = docs
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    // persisted: the total and the top-V cut both read this aggregate —
    // without the persist each job re-scans and re-counts the corpus
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (total, vocab) = try {
      (counts.agg(sum(col("c")).as("n")).collect()(0).getLong(0),
        counts.orderBy(col("c").desc, col("w").asc).limit(vocabSize)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    } finally counts.unpersist()
    // membership against the retained vocabulary is checked map-side
    // against the literal vocab BEFORE the bigram count shuffle, so
    // untracked bigrams never enter the exchange
    val vocabLit = typedlit(vocab)
    val biCounts = docs
      .select(filter(Text.tokens(col(textCol)), w => w =!= "").as("t"))
      .select(explode(bigramPairs(col("t"))).as("b"))
      .filter(
        element_at(vocabLit, element_at(split(col("b"), " "), 1)).isNotNull &&
        element_at(vocabLit, element_at(split(col("b"), " "), 2)).isNotNull)
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("b").asc).limit(bigramSize)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    BigramModel(vocab, biCounts, total)
  }

  /** "w1 w2" join keys for consecutive token pairs, as a map-side
    * array HOF (no explode-and-self-join). `zip_with` pads the shorter
    * side with null, which null-propagates through concat — the
    * trailing null pair is filtered out. Callers pass empty-filtered
    * token arrays, so the space separator is unambiguous.
    */
  private def bigramPairs(t: Column): Column =
    filter(
      zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      p => p.isNotNull)

  /** Score each document: (idCol, n_tokens, avg_logprob) with
    * avg_logprob = round(sum of bigram ln-probs / (n_tokens - 1), 6),
    * NULL for documents with fewer than 2 tokens.
    *
    * The per-document sum is a compiled Scala closure over real hash
    * maps — a deliberate exception to the functions-over-UDFs rule,
    * measured: the pure-expression form (`aggregate` HOF folding
    * `element_at(literal map)`) evaluates INTERPRETED with a linear
    * scan of the literal map per lookup (ArrayBasedMapData has no
    * hash) — 3 s for 270k bigrams at sf0.1; the broadcast-join form
    * trades the one-pass shape for two extra exchanges. The closure
    * keeps the exact left-fold IEEE arithmetic (same `Math.log`
    * Spark's own log expression uses), O(1) lookups, and the map-side
    * no-shuffle plan (asserted in LangModelSpec).
    */
  def scoreDocs(
      docs: DataFrame, idCol: String, textCol: String,
      model: BigramModel, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    val uni = model.unigrams
    val big = model.bigrams
    val n = model.totalTokens.toDouble
    val a = alpha
    val lpSum = udf { (toks: Seq[String]) =>
      var s = 0.0
      var i = 0
      while (i < toks.length - 1) {
        val w1 = toks(i)
        val w2 = toks(i + 1)
        s += (big.get(w1 + " " + w2) match {
          case Some(c12) => uni.get(w1) match {
            case Some(c1) => math.log(c12.toDouble / c1.toDouble)
            case None => math.log(a / n) // unreachable: retained => in vocab
          }
          case None => uni.get(w2) match {
            case Some(c2) => math.log(a * c2.toDouble / n)
            case None => math.log(a / n)
          }
        })
        i += 1
      }
      s
    }
    docs
      .select(col(idCol),
        filter(Text.tokens(col(textCol)), w => w =!= "").as("__t"))
      .select(
        col(idCol),
        size(col("__t")).as("n_tokens"),
        round(try_divide(
          lpSum(col("__t")),
          (size(col("__t")) - 1).cast("double")), 6).as("avg_logprob"))
  }
}
