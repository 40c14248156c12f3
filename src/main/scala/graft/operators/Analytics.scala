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
    // NULL users excluded like cohortRetention/eventTransitions: the
    // NULL groupBy key would collapse ALL anonymous step-1 events into
    // one phantom user that can never chain (NULL === NULL joins to
    // nothing), inflating the step-1 base and deflating conversion.
    // NULL TIMESTAMPS too: a user whose only step-1 events are
    // untimed entered the base with t_1 = NULL — a step-1 row that
    // can never chain (NULL > compares to nothing), deflating every
    // conversion ratio computed against count(*), and violating the
    // "row per user who performed step 1" contract with a NULL t_1
    var acc = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .filter(col(typeCol) === steps.head)
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
    // cross-engine-portable type for a calendar bucket. NULL users are
    // dropped up front: groupBy would size them into cohort_size as
    // one phantom member while the equi-join below can never match
    // them into n_active — biasing every affected cohort low.
    val named = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    val firsts = named.groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))
    val active = named
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
        // portableRound6, not round: n_active/cohort_size is an integer
        // ratio over an unbounded cohort size — 2^7·5^j sizes (640,
        // 3200, …) land exactly on .5e-6 ties (see Num)
        graft.functions.Num.portableRound6(
          col("n_active").cast("double") / col("cohort_size")))
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
    // NULL users form ONE window partition: anonymous events from
    // unrelated people would chain into fabricated transitions (and a
    // large NULL share makes that partition a skew hazard) — drop
    // them, as rollingUniques does. NULL TIMESTAMPS sort FIRST in the
    // ascending window, so an untimed event minted a fabricated
    // "NULL-ts -> first real event" transition (and untimed events
    // chained among themselves in tiebreak order) — no known ordering,
    // no transition; drop them like the user key. NULL EVENT TYPES the
    // same: kept, a typeless event minted a (prev -> NULL) transition
    // that deflated every real p_trans in prev's row AND broke the
    // real prev -> next chain — and downstream, markovStationary's
    // equi-joins never match the NULL state, so mass routed to it
    // silently vanished from the vector each iteration.
    val pairs = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull
        && col(typeCol).isNotNull)
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    val wp = Window.partitionBy(col("prev_type"))
    pairs.withColumn("p_trans",
      // same tie class: integer ratio over an unbounded row total
      graft.functions.Num.portableRound6(
        col("n_trans").cast("double") / sum(col("n_trans")).over(wp)))
  }
  /** Stationary distribution of the per-user behavior Markov chain —
    * the long-run companion to [[eventTransitions]]: the matrix says
    * where users go NEXT, its stationary vector says where attention
    * concentrates IN THE LIMIT (the PageRank question asked of
    * behavior states instead of documents). `iters` power-iteration
    * steps from the uniform vector over the observed states.
    *
    * Scale shape: the chain lives on the bounded state vocabulary —
    * after the one lag-window pass that mines transitions, every
    * subsequent join/aggregate touches only |states|² matrix rows per
    * iteration, never the event log again.
    *
    * Portability (the PageRank recipe): each step's contribution is
    * `round(x_i · (n_ij / rowsum_i), 6)` — one IEEE multiply over the
    * 6-rounded previous vector and the exact-count ratio — summed per
    * target state as exact DECIMAL(38,6), re-rounded to 6 places
    * before the next step, so an external engine replays every
    * iteration bit-for-bit. States with no outgoing transitions leak
    * their mass (the vector is not re-normalized between steps); the
    * `share` column renormalizes ONCE at the end and `mass` is the
    * leak audit. Output: (state, stationary, share).
    */
  def markovStationary(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      tiebreakCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"iters must be in [1, 8] (plans grow per step), got $iters")
    import org.apache.spark.sql.types.DecimalType
    val trans = eventTransitions(events, userCol, tsCol, typeCol, tiebreakCol)
    val withP = trans.withColumn("__rowsum",
      sum(col("n_trans")).over(Window.partitionBy(col("prev_type"))))
    val states = trans.select(col("prev_type").as("state"))
      .unionByName(trans.select(col("next_type").as("state")))
      .distinct()
    val wAll = Window.partitionBy(lit(1))
    // portableRound6 (r11 triage): the uniform init 1/N is an integer
    // ratio over the data-dependent state count — N in the divergent
    // 640-family (640, 3200, …) puts it exactly on a .5e-6 tie. Small
    // here, unbounded in general; oracle x0 in lockstep.
    var x = states.withColumn("x",
      graft.functions.Num.portableRound6(
        lit(1.0) / count(lit(1)).over(wAll)))
    for (_ <- 1 to iters) {
      val contrib = withP
        .join(x.withColumnRenamed("state", "prev_type"), Seq("prev_type"))
        .select(col("next_type").as("state"),
          // portableRound6: a 6dp-grid x times an exact integer ratio
          // reaches .5e-6 ties (the PageRank contribution class)
          graft.functions.Num.portableRound6(
            col("x") * (col("n_trans").cast("double")
              / col("__rowsum").cast("double")))
            .cast(DecimalType(38, 6)).as("__c"))
      x = states
        .join(contrib.groupBy(col("state")).agg(sum(col("__c")).as("__s")),
          Seq("state"), "left")
        .select(col("state"),
          round(coalesce(col("__s").cast("double"), lit(0.0)), 6).as("x"))
    }
    x.withColumn("__mass",
        sum(col("x").cast(DecimalType(38, 6))).over(wAll).cast("double"))
      .select(col("state"), col("x").as("stationary"),
        // portableRound6: 6dp-grid over 6dp-grid ratio — tie-reachable
        graft.functions.Num.portableRound6(
          try_divide(col("x"), col("__mass"))).as("share"))
  }
  /** Pairwise association rules over per-user item sets (market-basket
    * support / confidence / lift) — "users who touch A also touch B",
    * the co-behavior miner behind recommendations and funnel design.
    * A pair's lift > 1 means the items co-occur more than independence
    * predicts.
    *
    * Scale shape: the per-user distinct item list is the working set —
    * the pair self-join fans out C(items-per-user, 2) per user, which
    * the ITEM VOCABULARY bounds here; for long-tailed real baskets,
    * cap the per-user set first (capPerGroup) — the documented
    * contract, same as every pair miner in this engine. Supports and
    * lift are exact-integer ratios evaluated as single IEEE divisions
    * (`lift = n_ab·N / (n_a·n_b)` computed on exact products), round
    * 6. Output per unordered pair (a < b): (item_a, item_b, n_a, n_b,
    * n_ab, support, conf_a_b, conf_b_a, lift).
    */
  def associationRules(df: DataFrame, userCol: String, itemCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ut = df.filter(col(userCol).isNotNull && col(itemCol).isNotNull)
      .select(col(userCol).as("__u"), col(itemCol).cast("string").as("__i"))
      .distinct()
    val nUsers = ut.select(col("__u")).distinct()
      .agg(count(lit(1)).as("__n"))
    val itemCnt = ut.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val pairs = ut.as("x").join(ut.as("y"),
        col("x.__u") === col("y.__u") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(itemCnt.select(col("__i").as("item_a"),
        col("__ni").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemCnt.select(col("__i").as("item_b"),
        col("__ni").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(nUsers))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        // portableRound6 on all four: integer ratios over unbounded
        // user/item totals — the .5e-6 tie class (see Num)
        graft.functions.Num.portableRound6(
          col("n_ab").cast("double") / col("__n").cast("double"))
          .as("support"),
        graft.functions.Num.portableRound6(
          col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_a_b"),
        graft.functions.Num.portableRound6(
          col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_b_a"),
        graft.functions.Num.portableRound6(
          (col("n_ab").cast(DecimalType(38, 0))
            * col("__n").cast(DecimalType(38, 0))).cast("double")
          / (col("n_a").cast(DecimalType(38, 0))
            * col("n_b").cast(DecimalType(38, 0))).cast("double"))
          .as("lift"))
  }
  /** Exact trailing-window distinct users per day ("7-day rolling
    * uniques") — the reach metric no window function expresses
    * (COUNT(DISTINCT) OVER a frame is unsupported in every engine for
    * good reason: distinctness doesn't decompose over frames). The
    * scalable exact form: each distinct (user, day) pair votes for
    * the `windowDays` report days it covers (a bounded explode —
    * factor = window length), then one distinct-count per report day.
    * Report days are the days OBSERVED in the data (a semi join
    * drops votes cast past the last observed day).
    *
    * Scale shape: dedup to (user, day) first — the explode runs over
    * the aggregate, not raw events; the final count-distinct shuffles
    * (day, user) pairs bounded by uniques × window. At 100 TB with
    * wide windows, [[rollingUniquesHll]] is the drop-in sketch path
    * (HLL partials per day, merged across the frame) at ±~2%.
    * Output: (day, n_unique).
    */
  def rollingUniques(
      events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 92,
      s"windowDays must be in [1, 92] (explode factor), got $windowDays")
    val ud = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val days = ud.select(col("__d").as("day")).distinct()
    val votes = ud
      .select(col("__u"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__i"),
        col("__d"))
      .select(col("__u"), date_add(col("__d"), col("__i")).as("day"))
    votes
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("__u")).as("n_unique"))
      .orderBy(col("day"))
  }

  /** Sketch-path rolling uniques — the wide-window form
    * [[rollingUniques]]' Scaladoc names: one Datasketches HLL per
    * OBSERVED DAY (raw events collapse into per-partition sketch
    * partials map-side, so the shuffle carries at most
    * partitions × days sketch blobs — never (user, day) pairs), then
    * each day's sketch votes for the `windowDays` report days it
    * covers and votes MERGE per report day (register max — the same
    * union `q_agg_hll_merge` exercises). The explode runs over the
    * per-day sketch table (≤ #days rows), not data.
    *
    * Where the exact path's final count-distinct shuffles
    * uniques × window (user, day) pairs, this path's report-day merge
    * moves window × days fixed-size sketches — the only form whose
    * wire cost is independent of user cardinality. Price: ±~2%
    * (lgConfigK default 12) — the estimate, not the exact count.
    * Output: (day, n_unique_est) over the days observed in the data.
    */
  def rollingUniquesHll(
      events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 92,
      s"windowDays must be in [1, 92] (explode factor), got $windowDays")
    val daily = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .groupBy(col("__d"))
      .agg(hll_sketch_agg(col("__u")).as("__sk"))
    val days = daily.select(col("__d").as("day"))
    daily
      .select(col("__sk"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__i"),
        col("__d"))
      .select(col("__sk"), date_add(col("__d"), col("__i")).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk")))
        .as("n_unique_est"))
      .orderBy(col("day"))
  }
}
