package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: funnel conversion, cohort
  * retention, and state-transition matrices — the classic product-
  * analytics envelope, shaped so every step is a per-user equi-join or
  * a partial-combining aggregate (never a sort of the full event log).
  */
object Analytics {

  /** Per-user funnel timestamps: for the ordered `steps` event types,
    * the earliest time each user reached each step STRICTLY AFTER the
    * previous step's time. Row per user who performed step 1 at all;
    * `t_i` is NULL from the first step the user never completed
    * (NULL > NULL comparisons keep later steps NULL too — a dropout
    * stays dropped).
    *
    * Shape: step 1 is one partial-combining min per user; each later
    * step is an equi-join ON THE USER KEY between the accumulated frame
    * and the events pre-filtered to that step's type, followed by a
    * re-aggregation. Every join hashes on the same key, so at 100 TB the
    * exchanges are narrow (events are filtered to one type BEFORE the
    * join — predicate pushdown keeps the scan per step small) and AQE
    * coalesces the per-step frames, which shrink monotonically.
    * Strictly-after semantics: two steps sharing one timestamp do NOT
    * chain — documented, and what the `>` in the oracle encodes.
    */
  def funnelTimes(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps in $steps")
    val scratch = Seq("__u", "__ts")
    (scratch ++ steps.indices.map(i => s"t_${i + 1}")).foreach { c =>
      require(!events.columns.contains(c),
        s"input column '$c' collides with funnelTimes' columns")
    }
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_1"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val stepEvents = events.filter(col(typeCol) === st)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      val grouped = acc.columns.map(col)
      acc = acc.join(stepEvents,
          col(userCol) === col("__u") && col("__ts") > col(s"t_$i"), "left")
        .groupBy(grouped: _*)
        .agg(min(col("__ts")).as(s"t_${i + 1}"))
    }
    acc
  }

  /** Weekly cohort retention: users are assigned to the ISO week of
    * their first event, and each (cohort_week, week_offset) cell counts
    * the distinct users of that cohort active in that week, with the
    * retention share against the cohort's size.
    *
    * Shape: first-touch is a partial-combining min per user; activity
    * is a distinct over (user, week) — both shuffle on the user key and
    * join co-partitioned on it. Cohort sizes are a bounded-cardinality
    * frame (one row per week) and broadcast back onto the cells, so no
    * second wide shuffle exists. Retention is rounded to 6 places for
    * cross-engine double parity.
    */
  def cohortRetention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    Seq("cohort_week", "week_offset", "n_active", "cohort_size", "retention",
      "__wk").foreach { c =>
      require(!events.columns.contains(c),
        s"input column '$c' collides with cohortRetention's columns")
    }
    // weeks are DATEs (Monday-start), not midnight timestamps — the
    // cross-engine-portable type for a calendar bucket
    val firsts = events.groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))
    val active = events
      .select(col(userCol), to_date(date_trunc("week", col(tsCol))).as("__wk"))
      .distinct()
    val cells = active.join(firsts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("__wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = firsts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), Seq("cohort_week"))
      .withColumn("retention",
        round(col("n_active").cast("double") / col("cohort_size"), 6))
  }

  /** First-order transition matrix over each user's event sequence:
    * counts of adjacent (prev_type, next_type) pairs and the row-
    * normalized transition probability out of each prev state. Ordering
    * within a user is (ts, tiebreak) so runs are deterministic even
    * with equal timestamps.
    *
    * Shape: ONE window shuffle on the user key for the lag, then a
    * partial-combining count into a states² frame (tiny — bounded by
    * the event-type vocabulary), whose row normalization runs on the
    * aggregated cells, never on the raw events.
    */
  def eventTransitions(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      tiebreakCol: String): DataFrame = {
    Seq("prev_type", "next_type", "n_trans", "p_trans").foreach { c =>
      require(!events.columns.contains(c),
        s"input column '$c' collides with eventTransitions' columns")
    }
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val pairs = events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    val wp = Window.partitionBy(col("prev_type"))
    pairs.withColumn("p_trans",
      round(col("n_trans").cast("double") / sum(col("n_trans")).over(wp), 6))
  }
}
