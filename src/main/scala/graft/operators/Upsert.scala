package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Warehouse merge (SCD-1 upsert): apply a batch of keyed changes to a
  * base table — matched keys take the update row wholesale, unmatched
  * base rows pass through, brand-new keys insert. The reference's
  * warehouse loader only appends (`s3_to_postgres.py` COPY semantics);
  * a dimensional load needs the merge, so it ships as a first-class
  * operator.
  *
  * Shape: LEFT ANTI join (base minus updated keys) + `unionByName`. The
  * anti join shuffles on the key — or broadcasts when the update batch
  * is small, which is the common CDC case and Catalyst picks it
  * automatically; a base table bucketed on the key (see
  * `Sinks.writeBucketedTable`) makes it exchange-free. The union is
  * shuffle-free. This beats the full-outer-join formulation, which
  * shuffles BOTH sides and coalesces every column through the plan.
  *
  * Contract: both sides share a schema (`unionByName` fails fast on a
  * mismatch); `updates` must carry at most one row per key — collapse a
  * CDC feed that can hold several versions per key with the W1
  * latest-per-key window (q_window_latest) upstream.
  */
object Upsert {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    // Null-SAFE key equality (<=>): plain join equality never matches a
    // NULL key, so a base row and an update row both keyed NULL would
    // otherwise BOTH survive — the anti join must consider them the
    // same key for "matched keys take the update row" to hold.
    val updKeys = updates.select(keys.map(col): _*)
    val cond = keys.map(k => base(k) <=> updKeys(k)).reduce(_ && _)
    base.join(updKeys, cond, "left_anti").unionByName(updates)
  }
}
