package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right
  * row with the same key and right.ts <= left.ts.
  *
  * This is J6 in SURVEY.md §2.4 — the natural weather⋈station_status
  * correlation the reference leaves to downstream consumers
  * (`README.md:10` states the purpose; the DAG never joins,
  * `airflow/dags/etl_dag.py:409`). Spark has no built-in as-of join, so
  * this composes built-ins the scalable way:
  *
  * union both sides tagged → single hash-partition shuffle on the key →
  * one in-partition sort by (ts, tag) → `last(..., ignoreNulls)` window
  * carries the latest right values forward → keep left rows.
  *
  * Cost at scale: exactly ONE shuffle of (|L|+|R|) rows and one sort —
  * the same cost profile as a sort-merge join, with no range-explosion
  * and no broadcast/crossJoin. Skewed keys behave like any skewed
  * window partition (salt upstream if a single key dominates).
  *
  * Tie semantics: right rows sort before left rows at equal ts (tag 0 < 1),
  * so an exactly-simultaneous right row IS matched — same as
  * `ASOF JOIN ... ON l.ts >= r.ts`.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param key        equality key column name present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightCols  right columns to carry (renamed as given)
    * @param inner      true = drop left rows with no match (ASOF inner)
    * @param tolerance  optional staleness bound (the pandas merge_asof
    *                   contract): a match only counts if
    *                   `leftTs - matchedRightTs <= tolerance`. Pass a
    *                   literal in the ts columns' difference type — a
    *                   number for numeric ts, an INTERVAL expression
    *                   for timestamps. A stale match is treated as NO
    *                   match (dropped when `inner`, null-extended
    *                   otherwise) — the guard against correlating
    *                   against arbitrarily old reference data. Applied
    *                   as a pure post-fill filter: the plan keeps its
    *                   single shuffle.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Map[String, String],
      inner: Boolean = true,
      tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightCols, inner,
      tolerance, forward = false)

  /** FORWARD as-of join: for each left row, the EARLIEST right row
    * with the same key and right.ts >= left.ts — the "next event"
    * lookup (next price revision, next maintenance window, next
    * snapshot after a query point). Same single-shuffle union+window
    * plan as the backward [[asof]], scanning the in-partition sort in
    * DESCENDING time so the carried struct always holds the nearest
    * FUTURE right row; an exactly-simultaneous right row matches
    * (`r.ts >= l.ts`, mirroring the backward tie rule). `tolerance`
    * bounds `matchedRightTs - leftTs`.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Map[String, String],
      inner: Boolean = true,
      tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, key, leftTs, rightTs, rightCols, inner,
      tolerance, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Map[String, String],
      inner: Boolean,
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {

    val leftValueCols =
      left.columns.filterNot(c => c == key || c == leftTs).toSeq
    val carried = rightCols.values.toSeq

    // Fail fast on name collisions instead of emitting a frame with
    // duplicate column names (unusable by name downstream) or silently
    // clobbering a left column with an internal scratch column.
    val reserved = Seq("__ts", "__tag", "__r")
    val clash = left.columns.intersect(reserved)
    require(clash.isEmpty,
      s"left columns ${clash.mkString(", ")} collide with asof internals")
    // the RIGHT side is rewritten with the same scratch names before
    // the carried struct is built — an input column named __ts/__tag
    // would be silently clobbered and carry a constant
    val rClash = right.columns.intersect(reserved)
    require(rClash.isEmpty,
      s"right columns ${rClash.mkString(", ")} collide with asof internals")
    val carriedReserved = carried.intersect(reserved :+ "__mts")
    require(carriedReserved.isEmpty,
      s"carried destination names ${carriedReserved.mkString(", ")} " +
        "collide with asof internals")
    val missingSrc = rightCols.keys.filterNot(right.columns.contains).toSeq
    require(missingSrc.isEmpty,
      s"carried source columns ${missingSrc.mkString(", ")} not on the right side")
    require(carried.distinct.length == carried.length,
      s"duplicate carried destination names: ${carried.mkString(", ")}")
    val dup = carried.intersect(left.columns)
    require(dup.isEmpty,
      s"carried destination names ${dup.mkString(", ")} already exist on the left side")
    // key == leftTs passes every check above yet the final projection
    // emits TWO columns with that name (the key plus the renamed __ts)
    // — the exact unusable-by-name frame these requires exist to stop
    require(key != leftTs,
      s"key and leftTs must be distinct columns, both are '$key'")
    // the union coerces both timestamps into one __ts column: a type
    // mismatch (INT epoch vs STRING, DATE vs TIMESTAMP) would silently
    // widen — e.g. to STRING, where the window sorts LEXICOGRAPHICALLY
    // and carries right rows from the wrong side of the timeline.
    // Same rule for the key: coercion there changes which rows meet.
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"leftTs/rightTs types differ (${left.schema(leftTs).dataType} vs " +
        s"${right.schema(rightTs).dataType}) — the union would coerce " +
        "and can reorder time itself (cast explicitly)")
    require(left.schema(key).dataType == right.schema(key).dataType,
      s"key '$key' types differ between sides " +
        s"(${left.schema(key).dataType} vs ${right.schema(key).dataType}) " +
        "— cast explicitly")

    // The carried right values travel inside ONE struct through the
    // window fill. A left row is matched iff a right row preceded it in
    // its key partition — tested on the struct itself being non-null, so
    // a right row whose carried values are all legitimately NULL still
    // counts as a match (a per-column isNotNull test would silently drop
    // such left rows).
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .select(
        Seq(col(key), col("__ts"), col("__tag")) ++
          leftValueCols.map(col) :+
          lit(null).as("__r"): _*)

    // NULL join fields follow SQL ASOF semantics — the comparison is
    // UNKNOWN, so never a match. A right row with NULL key/ts is
    // filtered (unguarded, ascending NULLS-FIRST order would carry a
    // NULL-ts right row to EVERY later left row); a left row with NULL
    // ts/key reads unmatched via the post-fill guard below.
    val rTagged = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .select(
        Seq(col(key), col("__ts"), col("__tag")) ++
          leftValueCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(rightCols.map { case (src, dst) => col(src).as(dst) }.toSeq :+
            col(rightTs).as("__mts"): _*)
            .as("__r"): _*)

    // Backward scans time ascending (carry the latest past right row);
    // forward scans DESCENDING (carry the nearest future one). In both,
    // tag 0 < 1 puts the right row first within an equal-ts group, so
    // simultaneous right rows match. The final __r key pins which of
    // several right rows sharing the SAME (key, ts) is carried — the
    // greatest carried tuple, deterministically; without it the pick
    // is partition-order-dependent and re-runs diverge. (Carried
    // columns must therefore be orderable types — maps are not.)
    val w = Window.partitionBy(col(key))
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc,
        col("__tag").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged, allowMissingColumns = false)
      .select(
        (Seq(col(key), col("__ts"), col("__tag")) ++ leftValueCols.map(col) :+
          last(col("__r"), ignoreNulls = true).over(w).as("__r")): _*)
      .filter(col("__tag") === 1)
      // a NULL left ts makes the predicate UNKNOWN — never a match.
      // This matters in FORWARD mode, where desc NULLS-LAST ordering
      // would otherwise hand a NULL-ts left row the minimum-ts right
      // row's carry (backward's NULLS-FIRST already leaves it empty)
      .withColumn("__r", when(col("__ts").isNotNull, col("__r")))

    // A stale match (older than tolerance) becomes NO match before the
    // inner/outer decision, so both modes see one consistent contract.
    val bounded = tolerance match {
      case Some(tol) =>
        val gap = if (forward) col("__r.__mts") - col("__ts")
                  else col("__ts") - col("__r.__mts")
        filled.withColumn("__r", when(gap <= tol, col("__r")))
      case None => filled
    }

    val matched = if (inner) bounded.filter(col("__r").isNotNull) else bounded
    matched
      .select(
        (Seq(col(key), col("__ts")) ++ leftValueCols.map(col) ++
          // col("__r")(c), not col(s"__r.$c"): the string form parses a
          // dot in the carried name as struct nesting, so a legal
          // rename target like "station.status" failed analysis with a
          // message pointing nowhere near the cause; the apply form
          // treats the field name literally
          carried.map(c => col("__r")(c).as(c))): _*)
      .withColumnRenamed("__ts", leftTs)
  }
}
