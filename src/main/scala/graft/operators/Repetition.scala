package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Within-document repetition signals in the Gopher/MassiveText style:
  * heavily self-repeating documents (boilerplate, listings, SEO spam)
  * are a distinct failure mode from cross-document duplication, and
  * training pipelines filter on the fraction of the text consumed by
  * repeated n-grams.
  *
  * The per-document counting runs through the AGGREGATION engine —
  * explode n-grams to rows, two codegen'd HashAggregates with map-side
  * partial combine — for the same reason the MinHash/SimHash signatures
  * do (see `Dedup.minhashColumns`): a Column-expression histogram over
  * the gram array would be O(g²) per row and fall out of whole-stage
  * codegen. The shuffle key is (doc_id, gram) then doc_id — uniform by
  * construction, so the shape holds at 100 TB.
  */
object Repetition {

  /** Per-document n-gram repetition stats:
    *
    *  - `n_grams`        total n-grams (with multiplicity)
    *  - `n_unique_grams` distinct n-grams
    *  - `top_gram_frac`  fraction consumed by the single most frequent
    *                     n-gram
    *  - `dup_gram_frac`  fraction consumed by n-grams occurring more
    *                     than once (the Gopher "duplicate n-gram
    *                     fraction")
    *
    * Documents shorter than n tokens keep a row with zeroed stats (a
    * LEFT join back to the id set — the explode path drops them).
    */
  def repetitionStats(docs: DataFrame, n: Int): DataFrame = {
    val counts = docs
      .select(col("doc_id"), explode(Text.ngrams(col("text"), n)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val agg = counts.groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("total"),
      count(lit(1)).as("uniq"),
      max(col("cnt")).as("mx"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L))).as("dup"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("total"), lit(0L)).cast("int").as("n_grams"),
        coalesce(col("uniq"), lit(0L)).cast("int").as("n_unique_grams"),
        coalesce(round(col("mx").cast("double") / col("total"), 6), lit(0.0))
          .as("top_gram_frac"),
        coalesce(round(col("dup").cast("double") / col("total"), 6), lit(0.0))
          .as("dup_gram_frac"))
  }
}
