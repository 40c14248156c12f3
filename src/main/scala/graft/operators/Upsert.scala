package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, col, count, lead, lit, max, max_by, min, row_number, struct, when}

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

  /** SCD-2 history merge: apply a batch of keyed, timestamped attribute
    * changes to a slowly-changing-dimension HISTORY table that tracks
    * every version with a validity interval.
    *
    * `history`: key columns ++ attribute columns ++ `valid_from` /
    * `valid_to` (NULL `valid_to` = the key's open/current row).
    * `changes`: the same keys and attributes plus `tsCol`, the change's
    * effective timestamp.
    *
    * Semantics per key:
    *  - changes are sequenced by timestamp into back-to-back versions
    *    (`valid_from` = change ts, `valid_to` = next change ts, open for
    *    the last);
    *  - the pre-existing open row closes at the key's FIRST change ts;
    *  - keys without changes, and all already-closed rows, pass through
    *    untouched;
    *  - duplicate (key, ts) rows in one batch collapse deterministically
    *    to the lexicographically greatest attribute tuple (shuffle-order
    *    independent, unlike "pick any").
    *
    * Contract: change timestamps fall after the affected open row's
    * `valid_from` (late-arriving history rewrites need a key-scoped
    * rebuild, not a merge); NULL keys are not matched (SQL join
    * semantics — route them through a quarantine first).
    *
    * Scale shape: the window and both aggregates run over the CHANGE
    * BATCH only — a 100 TB history is never shuffled. Closed rows are a
    * pass-through filter; the open slice joins the per-key first-ts
    * aggregate, which is tiny (one row per changed key) and broadcasts.
    * The unions are shuffle-free.
    */
  def scd2Apply(
      history: DataFrame, changes: DataFrame,
      keys: Seq[String], tsCol: String): DataFrame = {
    require(keys.nonEmpty, "scd2Apply needs at least one key column")
    require(history.columns.contains("valid_from") &&
      history.columns.contains("valid_to"),
      "history must carry valid_from/valid_to interval columns")
    val scratch = Seq("__scd2_attrs", "__scd2_first_ts")
    scratch.foreach { c =>
      require(!history.columns.contains(c) && !changes.columns.contains(c),
        s"reserved scratch column name collides: $c")
    }
    // valid_from/valid_to are OUTPUTS here: a changes batch carrying
    // them (e.g. a history export re-fed as changes) would have them
    // classified as attribute columns, deduped, then silently
    // OVERWRITTEN by the withColumn below — a plausible-but-wrong
    // merge. Fail fast instead.
    Seq("valid_from", "valid_to").foreach { c =>
      require(!changes.columns.contains(c),
        s"changes must not carry '$c' — scd2Apply derives the validity " +
          s"interval from $tsCol (drop the column, or rebuild the key's " +
          "history instead of merging)")
    }
    val attrCols = changes.columns.filterNot(c =>
      keys.contains(c) || c == tsCol).toSeq
    require(attrCols.nonEmpty, "changes carry no attribute columns")
    // the REVERSE of the valid_from/valid_to guard: a changes column
    // absent from history (ingestion metadata, a renamed attribute)
    // would influence the max(struct(attrCols)) dedup tie-break and
    // then be silently DROPPED by the final history-shaped projection
    // — nondeterministic-looking winner selection plus silent loss
    attrCols.foreach { c =>
      require(history.columns.contains(c),
        s"changes column '$c' is absent from history — drop it (or add " +
          "it to the history schema) before merging")
    }

    val keyTs = (keys :+ tsCol).map(col)
    // a NULL change timestamp has no place on a validity timeline: it
    // would mint a NULL valid_from version AND null the open row's
    // valid_to (min(ts) = NULL), re-emitting it still open — TWO open
    // rows per key, silent history corruption. NULL KEYS are filtered
    // under the same quarantine rule — and actually filtered, not just
    // name-checked in a comment: the equi-joins below never match a
    // NULL key, so a NULL-key change minted a NEW open version while
    // the existing NULL-key open row stayed open, compounding one
    // extra open row per merge run. Route both to a dead-letter
    // upstream; don't merge them.
    val deduped = changes
      .filter((col(tsCol).isNotNull +: keys.map(k => col(k).isNotNull))
        .reduce(_ && _))
      .groupBy(keyTs: _*)
      .agg(max(struct(attrCols.map(col): _*)).as("__scd2_attrs"))
      .select(keyTs ++ attrCols.map(c => col(s"__scd2_attrs.$c").as(c)): _*)

    val seqW = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val versioned = deduped
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(seqW))
      .drop(tsCol)

    val firstTs = deduped.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__scd2_first_ts"))

    val open = history.filter(col("valid_to").isNull)
    val closedNow = open.drop("valid_to").join(firstTs, keys)
      .withColumn("valid_to", col("__scd2_first_ts"))
      .drop("__scd2_first_ts")
    val stillOpen = open.join(firstTs, keys, "left_anti")

    val outCols = history.columns.toSeq.map(col)
    history.filter(col("valid_to").isNotNull)
      .unionByName(closedNow.select(outCols: _*))
      .unionByName(stillOpen)
      .unionByName(versioned.select(outCols: _*))
  }

  /** Full CDC apply — [[upsert]] plus the DELETE channel: `changes`
    * carries the base schema + `opCol` ('I'/'U'/'D') + `tsCol`, and a
    * feed may hold SEVERAL versions of one key. Per key, the latest
    * change wins (ts, then op descending as the deterministic
    * same-instant tie-break — a delete-and-reinsert at one timestamp
    * resolves to the upsert, 'U'/'I' > 'D'): latest 'D' removes the
    * key, latest 'I'/'U' replaces or inserts the row, and unchanged
    * base rows pass through.
    *
    * Scale shape: the latest-per-key window runs over the CHANGE BATCH
    * only; the base table meets one anti join on the changed key set
    * (broadcast in the common small-batch case, exchange-free against
    * a key-bucketed base) and is never shuffled. NULL keys match
    * null-safely, like [[upsert]].
    */
  def applyCdc(
      base: DataFrame, changes: DataFrame, keys: Seq[String],
      tsCol: String, opCol: String): DataFrame = {
    require(keys.nonEmpty, "applyCdc needs at least one key column")
    // BOTH inputs checked (the scd2Apply/AsOfJoin convention): a
    // changes batch carrying __cdc_rn would have it silently clobbered
    // by the row_number below and folded into the tie-break struct
    Seq(base -> "base", changes -> "changes").foreach { case (df, side) =>
      require(!df.columns.contains("__cdc_rn"),
        s"$side column '__cdc_rn' collides with applyCdc's scratch column")
    }
    // A NULL op, an op outside the 'I'/'U'/'D' domain, or a NULL ts is
    // a malformed change row, quarantined like scd2Apply's NULL
    // keys/timestamps: a NULL op used to DELETE the base row silently
    // (its key entered the anti-join set while `op =!= 'D'` read NULL
    // and excluded it from survivors too); an off-domain op — a
    // lowercase 'd', 'DELETE', 'D ' with a stray space — would apply a
    // delete as an UPSERT (`op =!= "D"` keeps it as a survivor); and a
    // NULL ts has no place in a latest-wins ordering. Route them to a
    // dead-letter upstream; don't apply them.
    val wellFormed = changes.filter(
      col(opCol).isin("I", "U", "D") && col(tsCol).isNotNull)
    // The ordering must be TOTAL or the winner is shuffle-order
    // dependent: after (ts, op), fully tied rows resolve by the
    // lexicographically greatest attribute tuple (the scd2Apply
    // dedup convention), never by arrival order.
    val attrCols = changes.columns
      .filterNot(c => keys.contains(c) || c == tsCol || c == opCol).toSeq
    val tieBreak =
      if (attrCols.isEmpty) Nil
      else Seq(struct(attrCols.map(col): _*).desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col(tsCol).desc, col(opCol).desc) ++ tieBreak: _*)
    val latest = wellFormed
      .withColumn("__cdc_rn", row_number().over(w))
      .filter(col("__cdc_rn") === 1)
      .drop("__cdc_rn")
    val survivors = latest.filter(col(opCol) =!= "D").drop(opCol, tsCol)
    val changedKeys = latest.select(keys.map(col): _*)
    val cond = keys.map(k => base(k) <=> changedKeys(k)).reduce(_ && _)
    base.join(changedKeys, cond, "left_anti").unionByName(survivors)
  }

  /** Snapshot diff — CDC EXTRACTION when no change feed exists: given
    * two states of the same keyed table, emit one row per changed key
    * with `change_type` 'I' (in after only), 'D' (in before only) or
    * 'U' (present in both with different non-key values); unchanged
    * keys emit nothing. The output IS a change feed: replaying it onto
    * `before` via [[applyCdc]] reconstructs `after` — the round-trip
    * [[UpsertSpec]] asserts.
    *
    * Value columns carry the AFTER image for I/U and the BEFORE image
    * for D (the row being removed — an after-image would be all-null).
    *
    * Scale shape: one full-outer equi-join on the key (both sides
    * shuffle once, or zero times off bucketed/co-partitioned bases);
    * the unchanged majority dies in a pipelined null-safe struct
    * comparison BEFORE anything else happens, so downstream cost is
    * proportional to the CHANGED rows — the property that makes
    * diff-based CDC viable on a 100 TB table where changes are sparse.
    * Both frames must share the schema; NULL keys match null-safely
    * and NULL-vs-NULL values compare equal (no phantom updates).
    */
  def diffSnapshots(
      before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diffSnapshots needs at least one key column")
    require(before.columns.toSeq == after.columns.toSeq,
      s"schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val valCols = before.columns.filterNot(keys.contains).toSeq
    require(valCols.nonEmpty,
      "diffSnapshots needs at least one non-key column (key-only tables " +
        "diff to pure membership: use except/intersect)")
    val b = before.select(
      struct(keys.map(col): _*).as("__d_bk"),
      struct(valCols.map(col): _*).as("__d_bv"))
    val a = after.select(
      struct(keys.map(col): _*).as("__d_ak"),
      struct(valCols.map(col): _*).as("__d_av"))
    val joined = b.join(a, col("__d_bk") <=> col("__d_ak"), "full_outer")
      .filter(!(col("__d_bv") <=> col("__d_av"))) // unchanged rows die here
    val changeType = when(col("__d_bk").isNull, lit("I"))
      .when(col("__d_ak").isNull, lit("D"))
      .otherwise(lit("U"))
    val image = when(col("__d_ak").isNull, col("__d_bv")).otherwise(col("__d_av"))
    val keyImage = coalesce(col("__d_ak"), col("__d_bk"))
    joined.select(
      Seq(changeType.as("change_type")) ++
        keys.map(k => keyImage.getField(k).as(k)) ++
        valCols.map(c => image.getField(c).as(c)): _*)
  }
  /** Golden-record survivorship merge: per key, each field resolves
    * independently to the value carried by the LATEST row where that
    * field is non-null — the master-data-management move for entity
    * profiles assembled from feeds that each carry different
    * attributes (a click feed never has purchase amounts; blind
    * latest-row-wins would null out every attribute the newest feed
    * lacks).
    *
    * One aggregation pass: per field, `max_by(field,
    * CASE field IS NOT NULL THEN ord)` — rows where the field is
    * absent contribute a NULL ordering key, which both engines'
    * argmax skips, so each field follows its own freshest feed. `ord`
    * must be a totally-ordering SORTABLE column (the zero-padded
    * string composite is the cross-engine recipe — see q_ts_ohlc). A
    * field null in every version stays NULL. Adds `n_versions`.
    */
  def goldenRecord(
      df: DataFrame, keyCol: String, ordCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "goldenRecord needs at least one field")
    require(!fields.contains("n_versions"),
      "field 'n_versions' collides with goldenRecord's output")
    // the natural "all columns" call puts the key in fields — the
    // output would then carry keyCol TWICE (group column + max_by
    // alias) and die downstream with AMBIGUOUS_REFERENCE
    require(!fields.contains(keyCol),
      s"fields must not contain the key column '$keyCol' (it is " +
        "already the group column)")
    val aggs = count(lit(1)).as("n_versions") +: fields.map(f =>
      max_by(col(f), when(col(f).isNotNull, col(ordCol))).as(f))
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
