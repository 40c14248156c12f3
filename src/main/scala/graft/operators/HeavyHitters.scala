package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One counted candidate emitted by the Misra-Gries summary. */
case class MgEntry(key: String, cnt: Long)

/** Misra-Gries summary: k counters, mergeable, deterministic superset.
  *
  * Invariant (Misra-Gries '82; merge bound from Agarwal et al.,
  * "Mergeable Summaries", PODS '12): after summarizing n rows with k
  * counters, every key whose true frequency exceeds n/(k+1) is present
  * in the summary, and each retained counter undercounts its key by at
  * most n/(k+1). Both properties survive `merge`, so the partial
  * summaries Spark combines map-side compose into a valid summary of
  * the whole input — the candidate set can MISS nothing above the
  * threshold, only carry extra keys below it (removed by the exact
  * verify in [[HeavyHitters.heavyHitters]]).
  */
class MisraGriesAggregator(k: Int)
  extends Aggregator[String, mutable.Map[String, Long], Array[MgEntry]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(
      buf: mutable.Map[String, Long], key: String): mutable.Map[String, Long] = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < k => buf.update(key, 1L)
      case None =>
        // Decrement-all step: pairs this arrival against one prior
        // arrival of every tracked key. O(k), amortized O(1) per row
        // (each decrement cancels exactly one earlier increment).
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (kk, c) =>
          if (c == 1L) dead += kk else buf.update(kk, c - 1)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (kk, c) => a.update(kk, a.getOrElse(kk, 0L) + c) }
    if (a.size > k) {
      // Keep the k largest counters; subtracting the (k+1)-th largest
      // value from every counter preserves the undercount bound
      // (Mergeable Summaries, Thm 1) — the spill each dropped counter
      // represents is charged against every survivor equally.
      val pivot = a.values.toArray.sortWith(_ > _).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (kk, c) =>
        if (c - pivot <= 0L) dead += kk else a.update(kk, c - pivot)
      }
      dead.foreach(a.remove)
    }
    a
  }

  // Deterministic output order so the summary itself is comparable in
  // tests; counts are lower bounds, not exact frequencies.
  override def finish(buf: mutable.Map[String, Long]): Array[MgEntry] =
    buf.toArray.sortBy(_._1).map { case (kk, c) => MgEntry(kk, c) }

  override def bufferEncoder: ExpressionEncoder[mutable.Map[String, Long]] =
    ExpressionEncoder[mutable.Map[String, Long]]()
  override def outputEncoder: ExpressionEncoder[Array[MgEntry]] =
    ExpressionEncoder[Array[MgEntry]]()
}

/** Exact heavy hitters at 100 TB: bounded-state candidates + verify.
  *
  * The 100 TB problem: "which keys exceed s% of the corpus" via a full
  * `groupBy(key).count` shuffles the entire key space — at web scale
  * that is billions of group rows to answer a question whose output is
  * at most 1/s rows. The classic two-phase answer (the same
  * generate-then-verify shape as [[Bloom]] and the LSH pair miners):
  *
  *  1. **Candidates** — one partial-combined Misra-Gries aggregate with
  *     k = ceil(slack/s) counters. Each task reduces its partition to a
  *     ≤ k-entry summary map-side, so the exchange carries ≤ k rows per
  *     partition and the merged summary provably contains every key
  *     with share > 1/(k+1) ≥ every true heavy hitter.
  *  2. **Verify** — exact counts for candidate keys only: a broadcast
  *     membership filter drops non-candidate rows map-side, then a
  *     count aggregate whose post-combine exchange carries ≤ |cand|
  *     rows per partition. False candidates die here, so the final
  *     answer is EXACT — the summary only ever bounds the shuffle, it
  *     never decides the output.
  *
  * That exactness is what puts a full DuckDB oracle on a sketch-backed
  * query: the oracle is the plain `HAVING cnt > n*s` aggregate, with no
  * sketch replay needed (contrast the CMS oracle, which replays cells).
  */
object HeavyHitters {

  /** Candidate keys (with their lower-bound summary counts) from one
    * Misra-Gries pass with `k` counters. NULL keys are excluded (no
    * frequency identity). Output ≤ k rows: (key, mg_cnt).
    */
  def candidates(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val mg = udaf(new MisraGriesAggregator(k), ExpressionEncoder[String]())
    df.filter(col(keyCol).isNotNull)
      .agg(mg(col(keyCol).cast("string")).as("__mg"))
      .select(explode(col("__mg")).as("e"))
      .select(col("e.key").as("key"), col("e.cnt").as("mg_cnt"))
  }

  /** Exact keys with share > `minShare`, as (key, cnt, share).
    *
    * `slack` (> 1) widens the summary so the guarantee threshold
    * 1/(k+1) sits safely below `minShare`; candidates between the two
    * are extra work for the verify pass, never wrong answers. The share
    * is rounded to 6 places AFTER the exact-count division (the
    * [[SkewJoin.keySkewStats]] recipe) so it replays cross-engine.
    *
    * Determinism contract (same as the two-phase Bloom/LSH operators):
    * `df` is scanned TWICE — once for Misra-Gries candidates, once for
    * the exact verify — so it must be re-evaluation-stable. An input
    * built on `sample()`/`rand()`, or files mutated between the scans,
    * silently voids the candidate-superset guarantee; persist such an
    * input (or materialize it to parquet) before calling.
    */
  def heavyHitters(df: DataFrame, keyCol: String, minShare: Double,
      slack: Double = 2.0): DataFrame = {
    require(minShare > 0.0 && minShare < 1.0,
      s"minShare must be in (0,1), got $minShare")
    require(slack >= 1.0, s"slack must be >= 1, got $slack")
    val k = math.ceil(slack / minShare).toInt
    // k bounds EVERYTHING driver-side here: each task's Misra-Gries
    // buffer holds up to k entries, the collect pulls up to k
    // candidate strings into ONE driver row, and the verify filter
    // inlines them as an IN set. minShare = 1e-7 is not a heavy-hitter
    // question (k = 2e7 → driver OOM with no actionable error) — the
    // rollingUniques/markovStationary bounded-blowup convention.
    require(k <= 1000000,
      s"ceil(slack/minShare) = $k candidate keys exceed the 1e6 bound; " +
        "heavy-hitter screens need minShare >= ~2e-6 — use a plain " +
        "groupBy count for full-dictionary questions")
    val mg = udaf(new MisraGriesAggregator(k), ExpressionEncoder[String]())
    val keyed = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"))
    // the exact total rides the SAME aggregate as the Misra-Gries
    // candidates (a separate count agg was a third full scan); the
    // result is one row of ≤ k entries + a long — the bounded-model
    // collect idiom
    val head = keyed
      .agg(mg(col("key")).as("__mg"), count(lit(1)).as("total"))
      .collect()(0)
    val total = head.getLong(1)
    val candKeys = head.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val candFilter =
      if (candKeys.isEmpty) lit(false)
      else col("key").isInCollection(candKeys)
    keyed
      .filter(candFilter)
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(total) * lit(minShare))
      .select(col("key"), col("cnt"),
        // portableRound6, not round: cnt/total is an integer ratio
        // over an unbounded stream total — 2^7·5^j totals (640, 3200,
        // …) put the true share exactly on a .5e-6 tie (see Num)
        graft.functions.Num.portableRound6(
          col("cnt").cast("double") / lit(total)).as("share"))
  }

  /** [[heavyHitters]] per group: keys exceeding `minShare` of THEIR
    * GROUP's rows — hot keys per tenant / per day / per shard, the
    * operational telemetry shape. One Misra-Gries aggregate per group
    * (each group's summary is independently <= k entries, so the
    * exchange carries <= k rows per group per partition), then the same
    * broadcast-membership exact verify scoped by (group, key).
    * Output: (group, key, cnt, share), share of the group's total.
    */
  def heavyHittersPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      minShare: Double, slack: Double = 2.0): DataFrame = {
    require(minShare > 0.0 && minShare < 1.0,
      s"minShare must be in (0,1), got $minShare")
    require(slack >= 1.0, s"slack must be >= 1, got $slack")
    val k = math.ceil(slack / minShare).toInt
    // same bound as heavyHitters, with more reason: per-TASK state is
    // one k-entry buffer per group in flight, and cand carries up to
    // k rows per group into the semi join
    require(k <= 1000000,
      s"ceil(slack/minShare) = $k candidate keys per group exceed the " +
        "1e6 bound; heavy-hitter screens need minShare >= ~2e-6")
    val mg = udaf(new MisraGriesAggregator(k), ExpressionEncoder[String]())
    val keyed = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("grp"), col(keyCol).cast("string").as("key"))
    val cand = keyed.groupBy(col("grp")).agg(mg(col("key")).as("__mg"))
      .select(col("grp"), explode(col("__mg")).as("e"))
      .select(col("grp"), col("e.key").as("key"))
    val totals = keyed.groupBy(col("grp")).agg(count(lit(1)).as("total"))
    // null-safe group joins: a NULL group is a real segment (untagged
    // tenant) that groupBy tracks but an equi-join would silently drop
    // between the candidate and totals passes — its heavy hitters
    // would vanish with no error.
    // NO forced broadcast on cand/totals: they scale with GROUP
    // cardinality (up to k rows per group / one row per group) — at
    // the per-tenant/per-day telemetry scale this operator targets,
    // 50M groups x k would blow the broadcast relation limit. Both
    // joins are plain (null-safe) equi-joins; AQE broadcasts them
    // exactly when they are actually small. The global heavyHitters
    // keeps its k-bounded collect+isInCollection path.
    val counted = keyed.as("i")
      .join(cand.as("c"),
        col("i.grp") <=> col("c.grp") && col("i.key") === col("c.key"),
        "left_semi")
      .groupBy(col("grp"), col("key")).agg(count(lit(1)).as("cnt"))
    counted.as("x")
      .join(totals.as("t"), col("x.grp") <=> col("t.grp"))
      .filter(col("cnt") > col("total") * lit(minShare))
      .select(col("x.grp").as(groupCol), col("key"), col("cnt"),
        // same tie class as heavyHitters' share, per-group totals
        graft.functions.Num.portableRound6(
          col("cnt").cast("double") / col("total")).as("share"))
  }
}
