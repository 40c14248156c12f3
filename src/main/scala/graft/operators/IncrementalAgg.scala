package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance: keep a small MERGEABLE state
  * table per group instead of re-scanning the full fact table per
  * refresh — the pattern that turns a daily 100 TB rollup into a scan
  * of just the new partition plus a merge of two tiny state tables.
  *
  * State carries only ALGEBRAIC measures — (decimal sum, count, min,
  * max) — whose merge is itself a hash aggregation: `merge(a, b)` is
  * exact and associative, so state can be built per ingest batch, per
  * partition, or per day and combined in any order with bit-identical
  * results (the decimal sum is the same `dsum` portability contract the
  * direct queries use; double sums would be shuffle-order dependent).
  * Derived measures (avg) are computed at READ time by [[finish]], never
  * stored — storing them would make the state non-mergeable.
  *
  * The equivalence `finish(merge(build(old), build(new))) ==
  * full recompute` is the operator's contract; `q_agg_incremental`
  * proves it against a DuckDB full-recompute oracle, and the spec
  * exercises merge associativity and the empty-side identity.
  */
object IncrementalAgg {

  /** One state row per group: exact decimal sum, row count (of non-null
    * values: count/min/max/sum agree on the same support), min, max.
    */
  def buildState(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "buildState needs at least one group column")
    // entry guard (the Num.finiteWithin class): cast(NaN/Inf/1e27 AS
    // DECIMAL(28,2)) ANSI-kills the whole state build on ONE corrupt
    // row; bounded at the type's actual ceiling (10^26), the row costs
    // itself — consistent with the count/min/max NULL-skip support
    df.filter(graft.functions.Num.finiteWithin(col(valueCol), 9e25)
        || col(valueCol).isNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(28, 2))).as("sum_v"),
        count(col(valueCol)).as("n_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
  }

  /** Combine two state tables: union + one hash aggregation over the
    * (tiny) state rows. Decimal sums add exactly; counts add; min/max
    * fold. Associative and commutative, so any merge tree is valid.
    */
  def mergeState(a: DataFrame, b: DataFrame): DataFrame = {
    val groupCols = a.columns.filterNot(
      Seq("sum_v", "n_v", "min_v", "max_v").contains(_)).toSeq
    // group columns are INFERRED as "everything that isn't a measure",
    // so a frame carrying extra columns — finish() output (avg_v),
    // retractState output (needs_rebuild) — would silently treat them
    // as group keys and emit two rows for one real group; fail fast
    // with the actionable shape instead
    Seq("avg_v", "needs_rebuild").foreach { c =>
      require(!groupCols.contains(c),
        s"mergeState takes buildState-shaped frames; '$c' would be " +
          "inferred as a group key (drop derived columns before merging)")
    }
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("sum_v")).as("sum_v"),
        sum(col("n_v")).as("n_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Retraction-aware state maintenance — the DELETE channel: subtract
    * a batch of removed rows from the state without touching the base
    * table, rebuilding only where algebra cannot answer.
    *
    * Sums and counts retract EXACTLY (decimal subtraction is the group
    * inverse); min/max are NOT invertible — removing a non-extreme
    * value leaves them correct, but removing the stored extreme leaves
    * the new extreme unknown without a rescan. So each group gets a
    * `needs_rebuild` flag: true iff some deleted value ties the stored
    * min or max. The refresh pattern: keep unflagged groups as-is
    * (pure state math, zero base I/O) and rescan ONLY the flagged
    * groups' slice of the base — at real delete rates that is a
    * key-pruned read of a few groups, not a 100 TB pass.
    * `q_agg_retract` proves state-minus-deletes + selective rebuild
    * equals the full recompute over the surviving rows.
    *
    * Contract: `deletes` rows must actually exist in the aggregated
    * base (retracting a phantom row corrupts sums silently — guard
    * upstream with an anti-join when the feed is untrusted). Groups
    * whose rows are ALL deleted surface with n_v = 0, sum_v = 0 and
    * NULL min/max (the extremes are known-gone, not stale) plus
    * needs_rebuild = true — their empty rebuild slice then erases
    * them, matching [[buildState]] over the survivors. Flagged groups
    * with survivors carry their STALE min/max until rebuilt — the
    * flag, not the carried value, is the contract.
    */
  def retractState(
      state: DataFrame, deletes: DataFrame,
      groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "retractState needs at least one group column")
    // chaining retracts without rebuilding in between would CLEAR a
    // prior needs_rebuild flag: the new flag compares this batch's
    // extremes against the STALE carried min/max, so a group already
    // flagged would come back unflagged with untrusted extremes —
    // silent wrong answers at finish(). Rebuild flagged groups first.
    require(!state.columns.contains("needs_rebuild"),
      "state already carries needs_rebuild — rebuild the flagged " +
        "groups (re-run buildState on their base slice) before " +
        "retracting again; chained retracts would silently un-flag " +
        "stale min/max")
    // same entry guard as buildState — a corrupt delete row would
    // ANSI-kill the retract job at the decimal cast
    val del = deletes
      .filter(graft.functions.Num.finiteWithin(col(valueCol), 9e25)
        || col(valueCol).isNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(28, 2))).as("__d_sum"),
        count(col(valueCol)).as("__d_n"),
        min(col(valueCol)).as("__d_min"),
        max(col(valueCol)).as("__d_max"))
    val newN = col("n_v") - coalesce(col("__d_n"), lit(0L))
    // null-safe group join (<=>): groupBy kept a NULL group in the
    // state, and deletes against it aggregate under a NULL key — a
    // plain equi-join never matches them, so the NULL group's state
    // would go permanently, silently stale (the heavyHittersPerGroup
    // hazard)
    val joinCond = groupCols.map(c => state(c) <=> del(c)).reduce(_ && _)
    state.join(del, joinCond, "left")
      .select(
        groupCols.map(state(_)) ++ Seq(
          (col("sum_v") - coalesce(col("__d_sum"), lit(0))).as("sum_v"),
          newN.as("n_v"),
          when(newN === 0, lit(null)).otherwise(col("min_v")).as("min_v"),
          when(newN === 0, lit(null)).otherwise(col("max_v")).as("max_v"),
          // a rebuild needs a REAL deleted value tying the stored
          // extreme: NULL <=> NULL is true, so the null-safe compare
          // alone flags every all-NULL-value group (min_v NULL) whose
          // deletes are absent (__d_min NULL) — a pointless rescan
          ((col("__d_min").isNotNull && (col("__d_min") <=> col("min_v"))) ||
            (col("__d_max").isNotNull && (col("__d_max") <=> col("max_v"))))
            .as("needs_rebuild")): _*)
  }

  /** Incremental JOIN-view maintenance: the delta of `A join B` under
    * append-only deltas, from the distributive rewrite
    * `Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB`.
    *
    * The refresh cost argument: each term joins a DELTA against a base
    * (or the other delta) — with daily deltas a materialized join view
    * refreshes by joining one day against the base tables instead of
    * re-joining 100 TB x 100 TB. In every term the delta side is small
    * and broadcastable; the base side is scanned but never shuffled
    * when the view is bucketed on the key (the [[Upsert.upsert]]
    * argument). Appending the returned delta to the old view IS the
    * new view — `q_incremental_join` proves that equivalence against a
    * full-recompute oracle.
    *
    * Append-only contract: updates/deletes need the CDC channels
    * ([[Upsert.applyCdc]] / [[Upsert.diffSnapshots]]) and per-row
    * retraction bookkeeping, deliberately out of scope here.
    * Column sets must be disjoint except the join key.
    */
  def joinDelta(
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, key: String): DataFrame = {
    val shared = aOld.columns.toSet.intersect(bOld.columns.toSet)
    require(shared == Set(key),
      s"sides must share exactly the join key '$key'; shared: ${shared.mkString(", ")}")
    require(aOld.columns.sameElements(aDelta.columns) &&
      bOld.columns.sameElements(bDelta.columns),
      "each side's delta must match its base schema")
    aDelta.join(bOld, key)
      .unionByName(aOld.join(bDelta, key))
      .unionByName(aDelta.join(bDelta, key))
  }

  /** Read-time view over a state table: exposes the algebraic measures
    * plus the derived average (decimal sum cast to double, divided by
    * the count — the project-wide portable-average shape). try_divide,
    * not `/`: n_v = 0 rows are a state shape this file's own operators
    * produce (retractState's doc surfaces fully-deleted groups with
    * n_v = 0; buildState emits 0 for all-NULL-value groups), and a
    * plain division there is a whole-job ANSI DIVIDE_BY_ZERO — the
    * NULL average is the honest "no values" answer.
    */
  def finish(state: DataFrame): DataFrame =
    state.withColumn("avg_v",
      try_divide(col("sum_v").cast("double"), col("n_v").cast("double")))
}
