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
  *  - SCORE is one map-side pass: each document's tokens feed ONE
  *    compiled fold closure (a Scala UDF — the deliberate exception
  *    documented at [[BigramModel.scoreDocs]]) that walks the token
  *    array once, looks each bigram up in the model maps, and
  *    accumulates the log-probability as a deterministic LEFT FOLD —
  *    never a row-level SUM whose shuffle order could perturb the
  *    IEEE total. The only shuffle in a full scoring run is whatever
  *    the caller aggregates afterwards.
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

  /** Literal-path ceiling: below it the vocabulary membership filter
    * and the scoring maps embed in the plan/closure (codegen-friendly,
    * zero setup); above it [[train]] switches to a broadcast-variable
    * membership check and callers score via [[scoreDocsBcast]]. The
    * ceiling is SOFT — both paths are bit-identical (asserted at the
    * boundary in LangModelSpec).
    */
  val LiteralCap = 8192

  /** Hard model ceiling for either path: the pruned model is a
    * driver-collected MODEL and must stay node-memory-bounded (~100 B
    * per entry => ~100 MB at the cap — the same bounded-broadcast
    * budget as [[Bloom]]'s filter). A vocabulary past this is no
    * longer a pruned scoring LM; shard the corpus instead.
    */
  val MaxModelEntries = 1 << 20

  /** Train a pruned model over `textCol`. Empty tokens (from repeated
    * separators) are dropped. Below [[LiteralCap]] the vocabulary
    * membership pre-filter is a literal map lookup (codegen'd);
    * above it the vocabulary ships as a broadcast variable and the
    * filter is a hash-set probe — same rows retained, no plan-size
    * growth, corpus still never shuffles before the bigram count.
    */
  def train(
      docs: DataFrame, textCol: String,
      vocabSize: Int = 1000, bigramSize: Int = 4000): BigramModel = {
    require(vocabSize >= 1 && vocabSize <= MaxModelEntries,
      s"vocabSize must be in [1, $MaxModelEntries], got $vocabSize")
    require(bigramSize >= 1 && bigramSize <= MaxModelEntries,
      s"bigramSize must be in [1, $MaxModelEntries], got $bigramSize")
    val toks = docs
      .select(explode(Text.nonEmptyTokens(col(textCol))).as("w"))
    // persisted: the total and the top-V cut both read this aggregate —
    // without the persist each job re-scans and re-counts the corpus
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (total, vocab) = try {
      // sum over an EMPTY aggregate is NULL — surface "no tokens" as a
      // real message, not a getLong NPE (and a 0 total would later put
      // ln(alpha/0) = -Infinity under every backoff)
      val totalRow = counts.agg(sum(col("c")).as("n")).collect()(0)
      require(!totalRow.isNullAt(0),
        s"cannot train a language model on a corpus with no tokens " +
          s"(column '$textCol' is empty or all-blank)")
      (totalRow.getLong(0),
        counts.orderBy(col("c").desc, col("w").asc).limit(vocabSize)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    } finally counts.unpersist()
    // membership against the retained vocabulary is checked map-side
    // BEFORE the bigram count shuffle, so untracked bigrams never
    // enter the exchange. Two equivalent forms of the same filter:
    // a plan-literal map lookup while the vocab fits the codegen
    // budget, a broadcast hash-set probe past it (one copy per
    // executor, O(1) probes, zero plan growth).
    val bigramsAll = docs
      .select(Text.nonEmptyTokens(col(textCol)).as("t"))
      .select(explode(bigramPairs(col("t"))).as("b"))
    // switch on the REQUESTED size (the caller's declared scale
    // regime), not the realized map size: the plan shape stays stable
    // as the corpus grows toward the requested vocabulary
    val (bigramsInVocab, bcVocab) =
      if (vocabSize <= LiteralCap) {
        val vocabLit = typedlit(vocab)
        (bigramsAll.filter(
          element_at(vocabLit, element_at(split(col("b"), " "), 1)).isNotNull &&
          element_at(vocabLit, element_at(split(col("b"), " "), 2)).isNotNull),
          None)
      } else {
        val bc = docs.sparkSession.sparkContext.broadcast(vocab.keySet)
        val inVocab = udf { (b: String) =>
          val i = b.indexOf(' ') // tokens are space-split: first space separates
          bc.value.contains(b.substring(0, i)) && bc.value.contains(b.substring(i + 1))
        }
        (bigramsAll.filter(inVocab(col("b"))), Some(bc))
      }
    // the collect is the broadcast's only consumer — destroy right
    // after so repeated trainings in a long session don't pile stale
    // broadcast blocks on executors awaiting the ContextCleaner
    val biCounts =
      try bigramsInVocab
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("b").asc).limit(bigramSize)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      finally bcVocab.foreach(_.destroy())
    BigramModel(vocab, biCounts, total)
  }

  /** "w1 w2" consecutive-pair keys — the shared
    * [[graft.functions.Text.adjacentPairs]] (one definition with the
    * BPE trainers' pair mining).
    */
  private def bigramPairs(t: Column): Column = Text.adjacentPairs(t)

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
    validateScoreInputs(docs, idCol, alpha)
    val uni = model.unigrams
    val big = model.bigrams
    val n = model.totalTokens.toDouble
    val a = alpha
    val lpSum = udf { (toks: Seq[String]) => foldLogProb(toks, uni, big, n, a) }
    scoreWith(docs, idCol, textCol, lpSum)
  }

  /** The scale path past [[LiteralCap]]: identical scoring with the
    * model shipped as ONE Spark broadcast variable instead of a
    * closure capture — one deserialized copy per executor (closure
    * capture re-serializes the maps into every stage's task binary),
    * no plan-size growth, and the same zero-shuffle map-side plan
    * (asserted in LangModelSpec, with bit-equality to [[scoreDocs]]).
    * A broadcast-JOIN form was rejected: joining exploded bigrams
    * against the model requires re-grouping every bigram row back to
    * its document — a full corpus exchange the fold never pays.
    *
    * Broadcast lifecycle: the variable must outlive the RETURNED
    * DataFrame (any re-execution re-reads it), so this method cannot
    * destroy it; it follows the session's ContextCleaner — reclaimed
    * once the plan becomes unreachable, the standard lifecycle for
    * broadcast-in-closure. Callers scoring many models in one
    * long-lived session should materialize the result before dropping
    * the frame.
    */
  def scoreDocsBcast(
      docs: DataFrame, idCol: String, textCol: String,
      model: BigramModel, alpha: Double = 0.4): DataFrame = {
    validateScoreInputs(docs, idCol, alpha)
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val n = model.totalTokens.toDouble
    val a = alpha
    val lpSum = udf { (toks: Seq[String]) =>
      foldLogProb(toks, bc.value.unigrams, bc.value.bigrams, n, a)
    }
    scoreWith(docs, idCol, textCol, lpSum)
  }

  /** The shared left fold — ONE definition so the literal and the
    * broadcast paths cannot drift arithmetically.
    */
  private def foldLogProb(
      toks: Seq[String], uni: Map[String, Long], big: Map[String, Long],
      n: Double, a: Double): Double = {
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

  /** Shared entry guard of [[scoreDocs]] and [[scoreDocsBcast]] (ONE
    * definition — the two paths' whole design point is bit-identical
    * behavior, and a guard edited in one arm would silently desync
    * them): an idCol or doc column named like the outputs would emit
    * duplicate names or die downstream in AMBIGUOUS_REFERENCE.
    */
  private def validateScoreInputs(
      docs: DataFrame, idCol: String, alpha: Double): Unit = {
    Seq("n_tokens", "avg_logprob", "__t").foreach { c =>
      require(idCol != c, s"idCol '$c' collides with the scorer's outputs")
      require(!docs.columns.contains(c),
        s"input column '$c' collides with the scorer's output columns")
    }
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
  }

  private def scoreWith(
      docs: DataFrame, idCol: String, textCol: String,
      lpSum: org.apache.spark.sql.expressions.UserDefinedFunction): DataFrame =
    docs
      // coalesce: a NULL text would reach the fold UDF as a null array
      // (Spark does not null-guard reference-typed UDF inputs) and NPE
      // the scoring job; NULL scores like a blank document instead
      .select(col(idCol),
        Text.nonEmptyTokens(coalesce(col(textCol), lit(""))).as("__t"))
      .select(
        col(idCol),
        size(col("__t")).as("n_tokens"),
        // the documented <2-token contract, explicitly: try_divide
        // alone only nulls the n=1 case — a ZERO-token doc would read
        // 0.0 / -1.0 = -0.0 and outrank every real (negative-scoring)
        // document in a perplexity filter
        when(size(col("__t")) < 2, lit(null).cast("double"))
          .otherwise(round(try_divide(
            lpSum(col("__t")),
            (size(col("__t")) - 1).cast("double")), 6)).as("avg_logprob"))
}
