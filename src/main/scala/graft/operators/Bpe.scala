package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Text

/** Byte-pair-encoding merge training (Sennrich et al. '16) — the
  * tokenizer-construction primitive of a training-data pipeline: learn
  * the top-k symbol merges over a corpus, most-frequent adjacent pair
  * first.
  *
  * Scale shape — the working set is the DISTINCT-WORD table, not the
  * corpus: one corpus-wide word count (shuffle with map-side combine),
  * then every merge round runs over (word, count) rows — bounded by
  * vocabulary size however large the corpus. Per round: adjacent-pair
  * counts weighted by word count (explode + one partial-combining
  * aggregation), a TakeOrdered top-1 (one row to the driver — the
  * coreset/argmin idiom), and a map-side merge application. Each
  * round's word table is persisted and the previous round's cache
  * released after its successor materializes (the incremental-column
  * lesson: without the per-round persist, round r would lazily re-run
  * every earlier round's application).
  *
  * Merge application is GREEDY LEFT-TO-RIGHT, the classic BPE rule:
  * scan the symbol list, merge at the first (x, y) occurrence, resume
  * AFTER the merged token — so in a run of overlapping occurrences
  * the 1st, 3rd, 5th… merge ("a a a" under (a,a) → ["aa", "a"]). The
  * compiled closure keeps the application one map-side pass (the
  * LangModel interpreted-HOF lesson); the oracle replays the same
  * rule as odd-rank positions within runs of consecutive matches.
  *
  * Ties in pair counts break on the ascending "x y" pair string, so
  * the learned merge list is unique and cross-engine replayable.
  * Determinism contract: `docs` is scanned once for word counts, but
  * the greedy is sequential — same input, same merges.
  *
  * Symbol alphabet contract: the initial symbols are UTF-16 CODE
  * UNITS (Spark's `split(w, "")`), so a supplementary-plane character
  * (emoji, U+1D11E) starts as its two surrogate halves — analogous to
  * byte-level BPE starting below the codepoint (GPT-2 merges raw
  * bytes). An engine that splits by CODEPOINT (DuckDB's
  * `string_split(w, '')`) learns a different alphabet on astral
  * input; the generated oracles assume a BMP-only corpus (the
  * fixtures are ASCII), and a codepoint-level variant would swap the
  * split for a codepoint iterator in this one place.
  *
  * Output: (rank, left_sym, right_sym, merged, pair_count) for ranks
  * 1..k (fewer if the corpus runs out of repeated pairs).
  */
object Bpe {

  private[graft] def applyMerge(
      syms: Seq[String], x: String, y: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == x && syms(i + 1) == y) {
        out += (x + y); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Piece vocabulary after applying `k` learned merges: the ENCODE
    * side of BPE, reporting each resulting piece's total corpus count
    * and the number of distinct words it appears in — the
    * tokenizer-coverage report trained merges are judged by. Same
    * bounded working set (distinct words); merges are re-learned with
    * [[trainMerges]]' exact loop, then counts aggregate over the
    * final symbol table. Output: (piece, total_count, n_words),
    * descending by total_count (ties on piece asc), top `topN`.
    */
  def piecesAfterMerges(
      docs: DataFrame, textCol: String, k: Int, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = trainMerges(docs, textCol, k)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val applyAll = udf { (s: Seq[String]) =>
      ms.foldLeft(s) { case (acc, (x, y)) => applyMerge(acc, x, y) }
    }
    docs
      .select(explode(Text.nonEmptyTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        applyAll(filter(split(col("w"), ""), s => s =!= "")).as("syms"))
      .select(col("w"), col("cnt"), explode(col("syms")).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("cnt")).as("total_count"),
        countDistinct(col("w")).as("n_words"))
      .orderBy(col("total_count").desc, col("piece").asc)
      .limit(topN)
  }

  /** Greedy BPE merge learning, top-k merges over the distinct-word
    * working set.
    *
    * Round ceiling, stated like [[Sampling.farthestPointSample]]'s:
    * greedy BPE is INHERENTLY sequential — merge r+1's pair counts
    * depend on merge r's rewrite — so every round pays one driver
    * round-trip (the 1-row argmax), one persist of the rewritten
    * working set, and one count() barrier to materialize it before
    * the parent unpersists. k is capped at 32 because k rounds cost
    * k such barriers; the cap is about round-trip latency and persist
    * churn, not data volume (the working set is the DISTINCT-word
    * aggregate — it only shrinks as merges fuse symbols).
    *
    * The scale path past a few dozen merges is pair-count pruning:
    * drop pairs below a support floor each round (they can never win
    * an argmax later at these corpus sizes), batch-learn several
    * non-overlapping merges per round (pairs sharing no symbol
    * commute), or train on a frequency-capped word sample — the
    * standard production-tokenizer tricks, all of which change the
    * learned vocabulary and so belong to a caller's explicit opt-in,
    * not this exact-greedy operator (whose every round
    * `q_vocab_bpe`'s oracle replays bit-for-bit).
    */
  /** Batch-merge BPE training — the "non-overlapping batch merges"
    * scale path [[trainMerges]]' Scaladoc names, as the explicit
    * caller opt-in (the [[Sampling.farthestPointSampleBatched]]
    * recipe). Per ROUND: pair counts are aggregated and persisted
    * once, then up to `batch` merges are picked from that one counts
    * table — each pick the (count desc, "x y" asc) argmax among pairs
    * whose BOTH symbols are disjoint from every symbol already picked
    * this round AND whose merged token collides with none of them
    * (symbol-disjoint merges whose outputs stay out of each other's
    * patterns commute, so one sequential rewrite pass applies them
    * all order-independently) — and the working set is rewritten and
    * persisted ONCE. The expensive per-merge cost (working-set
    * rewrite + persist + count barrier) drops from k to
    * ceil(k/batch) rounds; picks are cheap TakeOrdered argmaxes on
    * the persisted vocabulary-sized counts aggregate.
    *
    * `batch = 1` is bit-identical to [[trainMerges]] (asserted in
    * BpeSpec). For `batch > 1` the relaxation is honest: picks 2..p
    * of a round rank by the counts BEFORE any of that round's
    * merges, so the learned list can diverge from the exact greedy's
    * (which recounts between merges) — same-round picks don't see
    * each other's rewrites. Pair counts of the emitted merges are the
    * pre-round counts (what the pick ranked by), like the exact
    * greedy's. A round that finds fewer than `batch` disjoint pairs
    * emits what it found; no disjoint pair at all ends training.
    *
    * Output: (rank, round, left_sym, right_sym, merged, pair_count),
    * rank = global pick order, round = the rewrite round that picked
    * it (all merges of one round applied in one pass; rounds can hold
    * fewer than `batch` picks when exclusions exhaust the candidates).
    */
  def trainMergesBatched(
      docs: DataFrame, textCol: String, k: Int, batch: Int): DataFrame = {
    require(batch >= 1 && batch <= 8,
      s"batch must be in [1, 8] (same-round merges share one pre-round " +
        s"count table; large batches drift far from the greedy), got $batch")
    val rounds = (k + batch - 1) / batch
    require(k >= 1 && rounds <= 32,
      s"ceil(k/batch) must be <= 32 rounds (one rewrite + persist " +
        s"barrier per round — see trainMerges' ceiling), got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._

    var cur = docs
      .select(explode(Text.nonEmptyTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), filter(split(col("w"), ""), s => s =!= "").as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = Seq.newBuilder[(Int, Int, String, String, String, Long)]
    var nPicked = 0
    var round = 0
    try {
      var exhausted = false
      // the ceil(k/batch) <= 32 require above bounds only the IDEAL
      // round count; exclusion-exhausted rounds (fewer than `batch`
      // disjoint picks) add rounds beyond it — worst case 1 pick/round
      // would run k persist+count barriers, the exact blowup the
      // 32-round contract exists to prevent. Bound the loop itself at
      // 2x the contract ceiling; hitting it ends training early with
      // the merges learned so far (the same emit-what-you-found
      // semantics an exhausted round already has).
      while (nPicked < k && !exhausted && round < 64) {
        round += 1
        val counts = cur
          .select(col("cnt"),
            // shared pair mining (Text.adjacentPairs): one definition
            // with the bigram LM — see the helper's doc
            explode(Text.adjacentPairs(col("syms"))).as("p"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("pc"))
          .select(split(col("p"), " ", 2).getItem(0).as("x"),
            split(col("p"), " ", 2).getItem(1).as("y"),
            col("p"), col("pc"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val roundPicks = Seq.newBuilder[(String, String)]
          var used = Set.empty[String]
          var nRound = 0
          var roundOpen = true
          while (roundOpen && nPicked < k && nRound < batch) {
            val cand =
              (if (used.isEmpty) counts
               else counts.filter(!col("x").isin(used.toSeq: _*) &&
                 !col("y").isin(used.toSeq: _*) &&
                 !concat(col("x"), col("y")).isin(used.toSeq: _*)))
                .orderBy(col("pc").desc, col("p").asc)
                .limit(1).collect()
            if (cand.isEmpty) roundOpen = false
            else {
              val (x, y) = (cand(0).getString(0), cand(0).getString(1))
              nPicked += 1
              nRound += 1
              merges += ((nPicked, round, x, y, x + y, cand(0).getLong(3)))
              roundPicks += ((x, y))
              // the merged token joins the exclusion set too: a later
              // same-round pick consuming OR producing it would see
              // positions this pick's rewrite creates (or vice versa),
              // breaking the order-independence disjointness buys
              used = used + x + y + (x + y)
            }
          }
          val picks = roundPicks.result()
          if (picks.isEmpty) exhausted = true
          else if (nPicked < k) {
            // rewrite only when another round will MINE from it: with
            // the quota already filled the rewrite + persist + count
            // barrier is one whole wasted distributed pass — the exact
            // per-round cost the round ceiling exists to bound
            val applyUdf = udf((s: Seq[String]) =>
              picks.foldLeft(s) { case (acc, (x, y)) => applyMerge(acc, x, y) })
            val next = cur.select(col("cnt"), applyUdf(col("syms")).as("syms"))
              .persist(StorageLevel.MEMORY_AND_DISK)
            next.count()
            cur.unpersist()
            cur = next
          }
        } finally counts.unpersist()
      }
      // the cap ending training is SILENT in the output (a truncated
      // merge table looks exactly like corpus exhaustion to callers
      // that don't count rows) — say so where a human will see it
      if (nPicked < k && !exhausted && round >= 64)
        System.err.println(
          s"[bpe] WARNING: round cap (64) reached with $nPicked/$k merges " +
            "picked — exclusion-exhausted rounds converged slowly and the " +
            "merge table is truncated")
    } finally cur.unpersist()
    merges.result()
      .toDF("rank", "round", "left_sym", "right_sym", "merged", "pair_count")
  }

  def trainMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 32,
      s"k must be in [1, 32] (one driver round-trip + persist barrier " +
        s"per merge round — see Scaladoc), got $k")
    val spark = docs.sparkSession
    import spark.implicits._

    // chars via split on the empty pattern; filter guards against any
    // engine-version quirk producing empty edge elements
    var cur = docs
      .select(explode(Text.nonEmptyTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), filter(split(col("w"), ""), s => s =!= "").as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    try {
      var r = 1
      var exhausted = false
      while (r <= k && !exhausted) {
        val top = cur
          .select(col("cnt"),
            explode(Text.adjacentPairs(col("syms"))).as("p"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("pc"))
          .orderBy(col("pc").desc, col("p").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val pair = top(0).getString(0)
          val pc = top(0).getLong(1)
          val Array(x, y) = pair.split(" ", 2)
          merges += ((r, x, y, x + y, pc))
          if (r < k) {
            // the final pick needs no rewrite — nothing mines from it
            // (one full UDF pass + persist barrier saved per call)
            val applyUdf = udf((s: Seq[String]) => applyMerge(s, x, y))
            val next = cur.select(col("cnt"), applyUdf(col("syms")).as("syms"))
              .persist(StorageLevel.MEMORY_AND_DISK)
            next.count()
            cur.unpersist()
            cur = next
          }
          r += 1
        }
      }
    } finally cur.unpersist()
    merges.result()
      .toDF("rank", "left_sym", "right_sym", "merged", "pair_count")
  }
}
