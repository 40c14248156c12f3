package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval containment joins WITHOUT an equi key, in equi-join shape.
  *
  * Spark plans `points JOIN intervals ON p BETWEEN s AND e` (no equality
  * conjunct) as a BroadcastNestedLoopJoin — every point is compared to
  * every interval, O(|P|·|I|). Fine for a handful of intervals, fatal at
  * 100 TB. (`q_join_range` keeps its equi conjunct and never hits this;
  * this operator is for the band-only case.)
  *
  * Binned shape: quantize the shared domain into width-`w` bins. Each
  * point lands in exactly ONE bin (`floor(p / w)`); each interval is
  * exploded to the bins it overlaps (`sequence(floor(s/w), floor(e/w))`
  * — `len/w + 1` rows, ~2 when `w` is chosen near the typical interval
  * length). Equi-join on the bin key, then the exact containment
  * residual. A point meets only the intervals overlapping its bin, and
  * because it is in exactly one bin no pair can be emitted twice — no
  * dedup pass, no distinct.
  *
  * Scale shape: the join is a plain equi-join, so Catalyst picks
  * broadcast when the exploded interval side is small (zero shuffle of
  * the point side — the common fact-vs-windows case) and a shuffled
  * hash/sort-merge join on the bin key otherwise. Skewed bins (a bin
  * holding a hot burst of points) are exactly key skew and AQE's skew
  * split / `SkewJoin.saltedEquiJoin` apply unchanged.
  *
  * The reference (etl_dag.py) has no join at all; this is [E]-envelope
  * surface (SURVEY.md §2.4 J5).
  */
object RangeJoin {

  private val BinCol = "__rj_bin"

  /** Floor-division bin id as a long — the SHARED primitive
    * [[graft.functions.Num.floorBin]], one definition for this
    * DataFrame path and [[graft.plans.BandJoinRewrite]]'s SQL rewrite
    * (exactness/overflow rationale lives there).
    */
  private def bin(v: Column, w: Long): Column =
    graft.functions.Num.floorBin(v.cast("long"), w)

  /** Join each point row to every interval row whose CLOSED interval
    * [startCol, endCol] contains it. Half-open semantics: pass
    * `end - 1` (integral domain) as `endCol`. Columns must be integral
    * (epoch days/seconds/...); rows with `end < start` match nothing.
    *
    * Output: point columns ++ interval columns (bin key dropped).
    *
    * `binWidth`: pick near the typical interval length — each interval
    * then explodes to ~2 bins. Too small explodes the interval side;
    * too large piles unrelated points into each bin's candidate set.
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // same disjoint-name contract as intervalOverlap: a shared name
    // would survive the bin equi-join as duplicate output columns and
    // die far downstream in AMBIGUOUS_REFERENCE
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals column names must be disjoint; " +
        s"shared: ${shared.mkString(", ")}")
    Seq(points -> "points", intervals -> "intervals").foreach { case (df, side) =>
      require(!df.columns.contains(BinCol),
        s"$side input already has a column named $BinCol (reserved)")
    }
    val p = points.withColumn(BinCol, bin(col(pointCol), binWidth))
    val i = intervals
      // sequence(a, b) generates DESCENDING when a > b — an inverted
      // interval would fabricate bins, so drop them (they can match
      // nothing under the containment predicate anyway).
      .filter(col(startCol) <= col(endCol))
      .withColumn(BinCol,
        explode(sequence(bin(col(startCol), binWidth), bin(col(endCol), binWidth))))
    p.join(i, BinCol)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(BinCol)
  }

  /** Interval × interval overlap join (closed intervals, integral
    * domain, no equi key): every (left, right) pair whose intervals
    * intersect, emitted EXACTLY once with no dedup pass. Both sides
    * explode to their overlapped bins and meet on the bin key; a pair
    * overlapping several shared bins is kept only in its CANONICAL bin
    * — the bin of `max(lStart, rStart)`, the overlap region's first
    * point, which both sides provably generated — so the multi-bin
    * duplicates die in a pipelined predicate, not a shuffle.
    *
    * The two frames' column sets must be disjoint (alias upstream).
    * Fan-out and skew behave as in [[pointInInterval]]; with
    * `binWidth` near the typical interval length each side explodes
    * to ~2 bins.
    */
  def intervalOverlap(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left and right column names must be disjoint; shared: ${shared.mkString(", ")}")
    Seq(left -> "left", right -> "right").foreach { case (df, side) =>
      require(!df.columns.contains(BinCol),
        s"$side input already has a column named $BinCol (reserved)")
    }
    def banded(df: DataFrame, s: String, e: String) =
      df.filter(col(s) <= col(e))
        .withColumn(BinCol,
          explode(sequence(bin(col(s), binWidth), bin(col(e), binWidth))))
    banded(left, lStart, lEnd).join(banded(right, rStart, rEnd), BinCol)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col(BinCol) === bin(greatest(col(lStart), col(rStart)), binWidth))
      .drop(BinCol)
  }

  /** Gaps-and-islands: collapse each key's overlapping-or-touching
    * closed intervals `[start, end]` into maximal merged spans — the
    * coverage question (when was ANY replica up / ANY shipment in
    * flight) that a naive self-join answers quadratically.
    *
    * Linear shape instead: per key ordered by (start, end), an interval
    * starts a new island iff its start exceeds the running max end of
    * every earlier interval; the island id is the running count of such
    * breaks, and one aggregate per (key, island) emits the span. Both
    * windows AND the final aggregate share the per-key hash
    * partitioning (partitioning by `key` co-locates every (key, island)
    * group), so the whole operator costs ONE shuffle. Inputs with
    * start > end are rejected rows and dropped (not silently widened).
    *
    * Output: key, island_start, island_end, n_merged — deterministic,
    * so the oracle replays the identical two-window form in SQL.
    */
  def mergeIntervals(
      df: DataFrame, key: String, startCol: String, endCol: String): DataFrame = {
    // OUTPUT names guarded like the scratch names: chaining a second
    // merge pass over a prior output (key = "island_start") would
    // otherwise emit TWO same-named columns and die far away in
    // AMBIGUOUS_REFERENCE instead of failing fast here
    val reserved = Seq("__mi_prev_max", "__mi_island",
      "island_start", "island_end", "n_merged")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input already has a column named $c (reserved)"))
    import org.apache.spark.sql.expressions.Window
    val byStart = Window.partitionBy(col(key))
      .orderBy(col(startCol), col(endCol))
    val prevMax = byStart.rowsBetween(Window.unboundedPreceding, -1)
    df.filter(col(startCol) <= col(endCol))
      .withColumn("__mi_prev_max", max(col(endCol)).over(prevMax))
      .withColumn("__mi_island",
        sum(when(col("__mi_prev_max").isNull
            || col(startCol) > col("__mi_prev_max"), 1L).otherwise(0L))
          .over(byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("__mi_island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("__mi_island")
  }
}
