package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Token-window chunking: split documents into fixed-token windows with
  * overlap — the context-length prep step of a training / RAG pipeline
  * (documents rarely fit a model context; retrieval needs sub-document
  * units).
  *
  * Map-side only: tokenization, window starts, slice and re-join are
  * all codegen'd array expressions feeding one generator (posexplode) —
  * no shuffle anywhere, so throughput is scan-bound at any corpus size
  * and the output inherits the input's partitioning.
  *
  * Window starts are 1, 1+step, ... with step = chunkTokens - overlap,
  * emitted while start <= max(len - overlap, 1): every token is
  * covered, consecutive chunks share exactly `overlap` tokens, and no
  * tail chunk is a strict subset of its predecessor. A document shorter
  * than chunkTokens yields exactly one chunk.
  */
object Chunking {

  /** Output: (doc_id, chunk_idx, chunk_text, n_tokens) — chunk_idx is
    * 0-based and dense per document.
    */
  def chunkByTokens(docs: DataFrame, chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    // NULL text carries no chunks: unfiltered, greatest/least's
    // null-skipping would fabricate one row with chunk_text = NULL and
    // n_tokens = chunkTokens — inflating token accounting by a full
    // chunk per null doc
    val nonNull = docs.filter(col("text").isNotNull)
    // The token array is let-bound through a single-element transform
    // (the Text.ngrams / Dedup.shingles trick): referencing a computed
    // Column directly would inline the tokenizer into the starts
    // sequence, every slice, and every length — Catalyst substitutes,
    // it does not let-bind.
    val chunks = element_at(
      transform(array(Text.tokens(col("text"))), w =>
        transform(
          sequence(lit(1), greatest(size(w) - overlap, lit(1)), lit(step)),
          st => struct(
            array_join(slice(w, st, lit(chunkTokens)), " ").as("chunk_text"),
            least(size(w) - st + 1, lit(chunkTokens)).as("n_tokens")))),
      1)
    nonNull
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx"),
        col("c.chunk_text").as("chunk_text"), col("c.n_tokens").as("n_tokens"))
  }
}
