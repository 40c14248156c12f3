package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Sequence packing for training batches: assign documents to
  * fixed-token-budget batches.
  *
  * This is the streaming-fill approximation every large pipeline uses:
  * documents are taken in a DETERMINISTIC order within each group, the
  * running token total is a window sum, and
  * `batch_id = tokens_before_this_doc div budget` — one window shuffle
  * per group, no driver-side loop, identical assignment on every
  * engine/run. A batch can overshoot the budget by at most its last
  * document (exact capacity packing needs sequential state per batch —
  * O(corpus) serial work — and pipelines accept the overshoot instead);
  * a document longer than the budget still lands in exactly one batch.
  */
object Packing {

  /** PRECONDITION: `orderCol` must be UNIQUE within each group (a
    * total order — a doc id, not a date). The running token sum is
    * computed over ORDER BY orderCol; rows tied on it sum in
    * partition-dependent order, so their batch assignment (and every
    * assignment after a tie straddling a budget boundary) would
    * differ between runs and engines. Not checked here — a
    * distinct-count pass would double the operator's cost; callers
    * own the invariant, as with [[Dedup]]'s caller-owns-sparsity.
    */
  def packByTokenBudget(
      docs: DataFrame, groupCol: String, orderCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // Output/scratch collision is a silent-clobber hazard (withColumn
    // REPLACES same-named columns and the __cum drop would then remove
    // user data) — fail fast, same policy as SkewJoin / capPerGroup.
    Seq("n_tokens", "__cum", "batch_id").foreach { c =>
      require(!docs.columns.contains(c),
        s"input column '$c' collides with packByTokenBudget's columns")
    }
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      // NULL-text docs drop (the chunkByTokens contract): a NULL token
      // count would otherwise mint a phantom batch_id-NULL batch whose
      // members array_join silently omits from the packed text
      .filter(col("text").isNotNull)
      .withColumn("n_tokens", Text.tokenCount(col("text")))
      .withColumn("__cum", sum(col("n_tokens").cast("long")).over(w))
      // integral `div`, not `/`: long division must stay exact
      .withColumn("batch_id", expr(s"(__cum - n_tokens) div $budget"))
      .drop("__cum")
  }

  /** Materialize packed batches as training SEQUENCES: one row per
    * (group, batch) with the member documents concatenated in order,
    * separated by `sep` (the EOS/document-boundary token) — the final
    * text→trainer handoff after [[packByTokenBudget]] assigns batches.
    *
    * Determinism without a sort shuffle: `collect_list` is
    * partition-order dependent, so each batch's members are collected
    * as (order, text) structs and canonicalized by `array_sort` INSIDE
    * the aggregate — one partially-combined exchange total, no window,
    * and the same sequence text on every run/partitioning. A batch is
    * budget-bounded by construction, so the collected array is
    * task-memory-safe at any corpus size (the batch, not the group, is
    * the memory unit).
    */
  def concatPacked(
      packed: DataFrame, groupCol: String, orderCol: String,
      sep: String): DataFrame = {
    Seq("n_docs", "batch_tokens", "seq_text").foreach { c =>
      require(!packed.columns.contains(c),
        s"input column '$c' collides with concatPacked's output columns")
    }
    packed
      .groupBy(col(groupCol), col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("batch_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol).as("o"),
              col("text").as("t")))),
            s => s.getField("t")),
          sep).as("seq_text"))
  }
}
