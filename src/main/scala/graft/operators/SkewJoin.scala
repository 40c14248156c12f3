package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins (SURVEY §4.2 / the 100 TB playbook).
  *
  * A shuffled equi-join hashes every row with the same key to the same
  * reducer; one hot key (a viral product, a null-heavy foreign key, a
  * default enum) turns a 1000-executor join into a single straggler
  * task. Salting splits each key into `salts` synthetic sub-keys: the
  * skewed side adds a deterministic per-row salt, the other side fans
  * out every row to ALL salt values, and the join runs on
  * (key, salt) — the hot key's rows now spread across `salts` reducers.
  *
  * This is the static-plan fallback when AQE's runtime skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`) cannot kick in — e.g. when
  * the skewed relation is freshly computed and has no stats, or the
  * skew is within one AQE-indivisible block. The join RESULT is
  * byte-identical to the plain join (every matching pair still meets on
  * exactly one salt), which makes the transform fully oracle-checkable.
  */
object SkewJoin {

  /** Inner equi-join of `skewed` (big, hot-keyed) with `other`
    * (smaller, but too big or too late-bound to broadcast).
    *
    * @param skewed    the relation whose key distribution is skewed
    * @param other     the relation replicated `salts`× (keep it the
    *                  smaller one; replication is the price of spread)
    * @param skewedKey equi-key column name on `skewed`
    * @param otherKey  equi-key column name on `other`
    * @param salts     sub-keys per key — the straggler task shrinks by
    *                  this factor, the replicated side grows by it
    * @param entropy   deterministic per-row expression on `skewed` rows
    *                  (e.g. a line number or rowid) the salt is hashed
    *                  from; determinism keeps every run and every retry
    *                  assigning the same salt, so the operator stays
    *                  reproducible and oracle-comparable
    */
  def saltedEquiJoin(
      skewed: DataFrame, other: DataFrame,
      skewedKey: String, otherKey: String,
      salts: Int, entropy: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // Scratch-column collision is a silent-clobber hazard (withColumn
    // replaces an existing column of the same name, and the final drop
    // removes BOTH names across the whole joined frame, so either side
    // carrying either name would lose user data) — fail fast like
    // AsOfJoin does, checking both names on both inputs.
    for {
      (df, side) <- Seq(skewed -> "skewed", other -> "other")
      c <- Seq("__salt_s", "__salt_o")
    } require(!df.columns.contains(c),
      s"$side input column '$c' collides with SkewJoin's internal salt column")
    val salted = skewed.withColumn(
      "__salt_s", pmod(xxhash64(entropy), lit(salts.toLong)))
    val fanned = other.withColumn(
      "__salt_o", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    // shuffle_hash: a broadcast would make the salt a no-op (that case
    // needs no salting), and sort-merge would pay an avoidable sort on
    // the widened key.
    // Keys resolve against their own side's DataFrame so the operator
    // also works when both sides name the key identically (the common
    // equi-join case) instead of raising AMBIGUOUS_REFERENCE. In that
    // case the replicated side's key is dropped from the output (its
    // values equal the kept key on every inner-join row), so the result
    // has ONE key column addressable by name — like join(other,
    // Seq(key)) — not two same-named columns usable only positionally.
    val joined = salted.join(fanned.hint("shuffle_hash"),
        salted(skewedKey) === fanned(otherKey) &&
          salted("__salt_s") === fanned("__salt_o"))
    (if (skewedKey == otherKey) joined.drop(fanned(otherKey)) else joined)
      .drop("__salt_s", "__salt_o")
  }

  /** Heavy-hitter diagnostic for a join/aggregation key: the `topN`
    * hottest key values with their row count and share of the table —
    * the measurement that decides whether a key needs [[saltedEquiJoin]]
    * or AQE skew handling at all, and the per-domain/per-source volume
    * report a corpus pipeline publishes each drop.
    *
    * Scale shape: one partial-combined count per key (the hot key
    * collapses to one row per partition map-side), the global total
    * joins in as a broadcast 1-row frame (lazy — no driver action), and
    * the top-N is `TakeOrderedAndProject` — N rows per partition cross
    * the wire, never the key dictionary. Output:
    * (keyCol, cnt, share), ordered (cnt desc, key) — total and
    * deterministic. NULL keys form their own group and can appear in
    * the output — deliberately: a null-heavy foreign key is the
    * canonical hot key this diagnostic exists to expose.
    */
  def keySkewStats(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    // Total from the already-aggregated counts, NOT a second df.agg —
    // an independent aggregate subtree would scan the full table twice.
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(
        col(keyCol),
        col("cnt"),
        // portableRound6, not round: cnt/total over an unbounded table
        // total — 2^7·5^j totals land exactly on .5e-6 ties (see Num)
        graft.functions.Num.portableRound6(
          col("cnt").cast("double") / col("__total")).as("share"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topN)
  }
}
