package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Num

/** Classifier-evaluation metrics over (score, label) columns — the
  * eval side of a data pipeline (quality-filter calibration, dedup
  * classifier tuning, retrieval relevance): exact, engine-portable
  * formulations instead of sketchy sampled curves.
  *
  * Both operators are rank arithmetic: one sort-shuffle of the scored
  * rows, integer cumulative counts, and a handful of divisions — no
  * approximation anywhere, so the DuckDB oracles replay them exactly.
  */
object Eval {

  /** Area under the ROC curve via the rank-sum (Mann-Whitney U)
    * identity: `AUC = (Σ_{positives} rank - n⁺(n⁺+1)/2) / (n⁺ n⁻)`,
    * with TIED scores assigned their average rank — the textbook-exact
    * treatment (a deterministic tie-BREAK instead would bias AUC by
    * the break order). A score group's average rank is
    * rows_before + (n+1)/2: halves are exact in binary, and the rank
    * sum accumulates as DECIMAL(38,1), so the single final division is
    * the only floating-point step.
    *
    * Scale shape: per-score partial aggregation collapses the corpus
    * map-side; the ordered window then runs over |distinct scores|
    * rows only, and one 1-row aggregate finishes. Output:
    * (auc, n_pos, n_neg).
    *
    * NULL scores or labels are dropped (no rank identity); `labelCol`
    * is boolean-ish (cast to int 0/1).
    */
  /** Shared entry filter for the binary-metric family (AUC / PR /
    * Brier / ECE — five hand-maintained copies had already diverged):
    * drops rows with NULL scores or labels (no observation), NaN
    * scores (passes isNotNull and sorts LARGEST — a NaN-scored
    * positive takes the top average rank and silently inflates AUC),
    * and optionally ±Inf scores (whose infinite square kills
    * Brier/ECE's decimal cast under ANSI).
    */
  private def scoredRows(
      scoreCol: String, labelCol: String, excludeInfScore: Boolean): Column = {
    val sd = col(scoreCol).cast("double")
    col(scoreCol).isNotNull && col(labelCol).isNotNull && !isnan(sd) &&
      (if (excludeInfScore) abs(sd) < Double.PositiveInfinity else lit(true))
  }

  /** The label as int 0/1, FAILING LOUD on anything else: a -1/+1 or
    * multiclass corpus makes `sum(__y)` read `#pos − #neg` and every
    * metric silently wrong — no filter semantics can rescue wholesale
    * mislabeling, so it is a caller bug, not a row to quarantine
    * (the KMeans raise_error convention). A fractional 0.7 "label"
    * previously cast silently to int 0; it raises now too.
    */
  private def binaryLabel(labelCol: String): Column =
    when(col(labelCol).cast("double").isin(0.0, 1.0),
      col(labelCol).cast("int"))
      .otherwise(raise_error(concat(
        lit("Eval: label must be 0/1, got "),
        col(labelCol).cast("string"))).cast("int"))

  def aucByRank(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val scored = df
      .filter(scoredRows(scoreCol, labelCol, excludeInfScore = false))
      .select(col(scoreCol).cast("double").as("__s"),
        binaryLabel(labelCol).as("__y"))
    // Per-score combine FIRST (map-side partial), so the only ordered
    // window runs over |distinct scores| rows — the operator's real
    // state bound. A continuous score at corpus scale should be
    // quantized upstream (round to 6 is standard and leaves AUC
    // differences below reporting precision).
    val perScore = scored.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
    val before = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Tied scores take their AVERAGE rank (exact halves):
    // avg_rank(group) = rows_before + (n_group + 1)/2.
    val withRank = perScore.withColumn("__avg_rank",
      (coalesce(sum(col("__n")).over(before), lit(0L)).cast("double")
        + (col("__n") + 1).cast("double") / lit(2.0)))
    withRank.agg(
        sum((col("__np").cast("double") * col("__avg_rank"))
          .cast(DecimalType(38, 1))).as("__pos_rank_sum"),
        sum(col("__np")).as("n_pos"),
        sum(col("__n") - col("__np")).as("n_neg"))
      .select(
        // try_divide: a single-class input (n_pos or n_neg = 0) reads
        // NULL, matching aucByRankGrouped's documented contract — the
        // plain division would emit NaN/Infinity into downstream gates
        // portableRound6, not round: a 0.5-grid rank sum over the
        // integer n_pos·n_neg product reaches .5e-6 ties at 2^7·5^j
        // denominators (see Num)
        graft.functions.Num.portableRound6(try_divide(
          col("__pos_rank_sum").cast("double")
            - col("n_pos").cast("double") * (col("n_pos") + 1).cast("double")
              / lit(2.0),
          col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Precision/recall curve: one point per DISTINCT score threshold t
    * (classify positive iff score >= t), descending. Cumulative true
    * positives and predicted positives come from one running window
    * over the per-score aggregates (|distinct scores| rows — the heavy
    * lifting is the per-score combine, which is map-side partial).
    * Output: (threshold, n_predicted, tp, precision, recall), both
    * ratios rounded to 6 after the division. An all-negative input has
    * no defined recall: try_divide yields NULL there in BOTH engines
    * (plain division would diverge — Spark non-ANSI returns NULL where
    * DuckDB's IEEE float division returns inf).
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val scored = df
      // NaN would form a bogus first threshold point (desc-sorts first)
      .filter(scoredRows(scoreCol, labelCol, excludeInfScore = false))
      .select(col(scoreCol).cast("double").as("threshold"),
        binaryLabel(labelCol).as("__y"))
    val perScore = scored.groupBy(col("threshold"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
    val desc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // total positives from the SAME ordered window, unbounded on both
    // sides — a separate aggregate over `scored` re-scanned the source
    // twice and paid a broadcast join for a value the window already
    // holds (the per-distinct-score frame is tiny; the source scan is
    // the corpus-scale cost)
    val all = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perScore
      .withColumn("n_predicted", sum(col("__n")).over(desc))
      .withColumn("tp", sum(col("__np")).over(desc))
      .withColumn("__total_pos", sum(col("__np")).over(all))
      .select(col("threshold"), col("n_predicted"), col("tp"),
        // portableRound6: integer ratios over unbounded cumulative
        // counts — the .5e-6 tie class (see Num)
        graft.functions.Num.portableRound6(
          col("tp").cast("double") / col("n_predicted")).as("precision"),
        graft.functions.Num.portableRound6(
          try_divide(col("tp").cast("double"), col("__total_pos")))
          .as("recall"))
  }

  /** Per-group (sliced) rank-sum AUC — [[aucByRank]] partitioned by a
    * slice column: the fairness/segment report ("is the quality
    * classifier equally good on every language?"). Same exact
    * average-rank tie handling and decimal rank sums; the ordered
    * window runs per group over that group's distinct scores, so state
    * stays bounded by per-group score cardinality. Groups with no
    * positives or no negatives have no defined AUC and surface NULL
    * (`try_divide`). Output: (group, auc, n_pos, n_neg) one row per
    * group.
    */
  def aucByRankGrouped(
      df: DataFrame, groupCol: String,
      scoreCol: String, labelCol: String): DataFrame = {
    val scored = df
      .filter(col(groupCol).isNotNull &&
        scoredRows(scoreCol, labelCol, excludeInfScore = false))
      .select(col(groupCol).as("__g"),
        col(scoreCol).cast("double").as("__s"),
        binaryLabel(labelCol).as("__y"))
    val perScore = scored.groupBy(col("__g"), col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
    val before = Window.partitionBy(col("__g")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withRank = perScore.withColumn("__avg_rank",
      (coalesce(sum(col("__n")).over(before), lit(0L)).cast("double")
        + (col("__n") + 1).cast("double") / lit(2.0)))
    withRank.groupBy(col("__g").as(groupCol))
      .agg(
        sum((col("__np").cast("double") * col("__avg_rank"))
          .cast(DecimalType(38, 1))).as("__pos_rank_sum"),
        sum(col("__np")).as("n_pos"),
        sum(col("__n") - col("__np")).as("n_neg"))
      .select(col(groupCol),
        // portableRound6, not round: a 0.5-grid rank sum over the
        // integer n_pos·n_neg product reaches .5e-6 ties at 2^7·5^j
        // denominators (see Num)
        graft.functions.Num.portableRound6(try_divide(
          col("__pos_rank_sum").cast("double")
            - col("n_pos").cast("double") * (col("n_pos") + 1).cast("double")
              / lit(2.0),
          col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Brier score — mean squared error of a probability-like score
    * against the binary label: the strictly proper scoring rule
    * companion to [[ece]] (ECE can be gamed by coarse scores; the
    * Brier score cannot). Each squared residual is cast to
    * DECIMAL(38,12) before summing so the mean is shuffle-order
    * independent; the single final division is the only float step
    * after the per-row square. Output: (brier, n_rows).
    */
  def brier(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val scored = df
      // a NaN residual kills the DECIMAL(38,12) cast under ANSI — and
      // so does an INFINITE score's infinite square; neither carries
      // calibration signal, both are excluded
      .filter(scoredRows(scoreCol, labelCol, excludeInfScore = true))
      .select(col(scoreCol).cast("double").as("__p"),
        binaryLabel(labelCol).as("__y"))
    scored
      .select(((col("__p") - col("__y")) * (col("__p") - col("__y")))
        .cast(DecimalType(38, 12)).as("__sq"))
      .agg(
        // portableRound6: scores can arrive grid-quantized, making
        // the squared-error sum a grid value over a count — the same
        // tie class as every other mean kernel (see Num)
        graft.functions.Num.portableRound6(
          sum(col("__sq")).cast("double") / count(lit(1))).as("brier"),
        count(lit(1)).as("n_rows"))
  }

  /** Expected Calibration Error over `bins` equi-frequency score
    * buckets: `ECE = Σ_b (n_b / N) * |pos_rate_b - mean_score_b|` —
    * the scalar companion to the reliability-diagram deciles
    * (`q_eval_calibration`), the single number a quality-filter
    * pipeline alerts on when its classifier drifts.
    *
    * Portability: per-bin pos_rate and mean_score are 6-dp-rounded
    * doubles (the calibration-bin kernel), then RE-CAST to
    * DECIMAL(18,6) so the weighted |gap| sum is EXACT decimal
    * arithmetic — shuffle-order independent with no fold needed —
    * and the single final division is the only floating-point step.
    * Output: (ece, n_rows, n_bins). NULL scores/labels are dropped.
    */
  def ece(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    val scored = df
      // NaN scores pass isNotNull, land in quantileBucket's NULL bin,
      // and their decimal cast in the bin-mean sum dies under ANSI —
      // a probability column's NaNs carry no calibration signal.
      // Infinite scores die on the same cast (brier's guard).
      .filter(scoredRows(scoreCol, labelCol, excludeInfScore = true))
      .select(col(scoreCol).cast("double").as("score"),
        binaryLabel(labelCol).as("__y"))
    // portableRound6 on every bin mean and the final ratio (not
    // built-in round): these are 6dp-quantized sums over SMALL counts,
    // the exact shape whose quotients land on .5e-6 boundaries at
    // ~1/n incidence — where the engines' ROUND tie conventions
    // diverge (Num's doc, the r9 sf0.1 incident class)
    import graft.functions.Num.portableRound6
    val perBin = Profile.quantileBucket(scored, "score", bins)
      .groupBy(col("score_qbucket").cast("long").as("__bin"))
      .agg(count(lit(1)).as("__n"),
        portableRound6(sum(portableRound6(col("score"))
            .cast(DecimalType(38, 6)))
          .cast("double") / count(lit(1))).as("__mean"),
        portableRound6(sum(col("__y")).cast("double") / count(lit(1)))
          .as("__pos"))
    perBin.agg(
      portableRound6(
        sum(abs(col("__pos").cast(DecimalType(18, 6))
            - col("__mean").cast(DecimalType(18, 6))) * col("__n"))
          .cast("double") / sum(col("__n")).cast("double")).as("ece"),
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_bins"))
  }
  /** Cohen's kappa for inter-annotator agreement — the labeling-QA
    * gate a supervised corpus runs before trusting its labels (raw
    * percent-agreement flatters raters who both spam the majority
    * class; kappa subtracts chance agreement):
    * `κ = (p_o − p_e) / (1 − p_e)` with observed agreement p_o and
    * chance agreement `p_e = Σ_k p_a(k)·p_b(k)` from the marginals.
    *
    * One count shuffle builds the (a, b) confusion cells; marginals
    * aggregate from those cells and meet on the class key. Every probability is
    * an exact-integer ratio: the final kappa clears denominators to
    * `(n·Σ_diag n_kk − Σ_k r_k·c_k) / (n² − Σ_k r_k·c_k)` — exact
    * DECIMAL numerator/denominator, ONE IEEE division, round 6 (NULL
    * when the raters are constant and identical — p_e = 1 makes kappa
    * undefined). NULL labels on either side are excluded. Output:
    * (n_items, p_observed, p_chance, kappa).
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // the label keys compare via their STRING renderings (class labels
    // can be any type): an INT rater against a DOUBLE rater renders
    // "1" vs "1.0" and two numerically identical verdicts never agree
    // — kappa reads strongly negative for perfect agreement, silently.
    // Identical types make the renderings agree; refuse anything else
    // up front (the Bloom.prunedSemiJoin convention).
    require(df.schema(aCol).dataType == df.schema(bCol).dataType,
      s"rater column types must match exactly (labels compare as " +
        s"strings): ${df.schema(aCol).dataType.simpleString} vs " +
        s"${df.schema(bCol).dataType.simpleString}")
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .agg(count(lit(1)).cast(DecimalType(38, 0)).as("__c"))
    // Σ r_k·c_k needs one term per CLASS, not per cell, so the
    // marginals aggregate separately and meet on the class key.
    val aM = cells.groupBy(col("__a").as("__k"))
      .agg(sum(col("__c")).as("__ra"))
    val bM = cells.groupBy(col("__b").as("__k"))
      .agg(sum(col("__c")).as("__cb"))
    // DISJOINT label sets make the inner join empty and a bare sum()
    // NULL — kappa/p_chance would read NULL where the correct values
    // are 0.0 (p_o = 0, p_e = 0: total disagreement, zero chance
    // agreement; NULL is reserved for the p_e = 1 constant-raters case)
    val prodSum = aM.join(bM, Seq("__k"))
      .agg(coalesce(sum(col("__ra") * col("__cb")),
        lit(0).cast(DecimalType(38, 0))).as("__rc"))
    val diagAndN = cells.agg(
      sum(when(col("__a") === col("__b"), col("__c"))
        .otherwise(lit(0).cast(DecimalType(38, 0)))).as("__diag"),
      sum(col("__c")).as("__n"))
    diagAndN.crossJoin(prodSum).select(
      col("__n").cast("long").as("n_items"),
      // portableRound6 on all three: integer ratios over unbounded
      // item totals — the .5e-6 tie class (see Num)
      graft.functions.Num.portableRound6(
        col("__diag").cast("double") / col("__n").cast("double"))
        .as("p_observed"),
      graft.functions.Num.portableRound6(col("__rc").cast("double")
        / (col("__n") * col("__n")).cast("double")).as("p_chance"),
      graft.functions.Num.portableRound6(try_divide(
        (col("__n") * col("__diag") - col("__rc")).cast("double"),
        (col("__n") * col("__n") - col("__rc")).cast("double")))
        .as("kappa"))
  }
}
