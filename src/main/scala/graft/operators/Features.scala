package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Feature hashing (the "hashing trick", Weinberger et al. ICML'09):
  * categorical columns become a fixed-width sparse count vector with
  * NO vocabulary pass — index = md5("col=value") mod dim. The
  * featurizer that never needs a dictionary build, never grows with
  * cardinality, and assigns features identically on every engine, run,
  * and data slice (a vocabulary-indexed encoder reshuffles ids every
  * time the vocabulary changes — poison for incremental training).
  *
  * Shape: one map-side explode of the bounded per-row feature list,
  * one (row, index) count aggregate keyed by the row id — nothing
  * depends on category cardinality. Collisions are the documented
  * hashing-trick trade (dim trades memory for collision rate); md5
  * keeps them engine-identical.
  */
object Features {

  /** Sparse hashed count vector per row, serialized as the canonical
    * "idx:count" comma-joined string sorted by index (array columns
    * can't cross the driver's comparator — the project-wide
    * serialization rule, and the stable storage form). Each feature
    * hashes as "column=value"; NULL values hash as the column's
    * missing-marker "column=" (missingness is itself signal).
    * Output: (idCol, n_features, features).
    */
  def hashedFeatures(
      df: DataFrame, idCol: String, featureCols: Seq[String],
      dim: Int): DataFrame = {
    require(featureCols.nonEmpty, "hashedFeatures needs feature columns")
    // a repeated column would silently DOUBLE its feature counts (the
    // categoricalProfile distinct-columns rule)
    require(featureCols.distinct.size == featureCols.size,
      s"featureCols must be distinct, got ${featureCols.mkString(", ")}")
    require(dim >= 2 && dim <= (1 << 20),
      s"dim must be in [2, 2^20], got $dim")
    // an idCol named like an OUTPUT column would emit two same-named
    // columns and die downstream in AMBIGUOUS_REFERENCE — the
    // imputeWithGroupMean/goldenRecord fail-fast convention
    Seq("n_features", "features").foreach(c => require(idCol != c,
      s"idCol '$c' collides with hashedFeatures' output columns"))
    // idCol must be UNIQUE (a duplicate id's rows would merge into one
    // summed vector — a distinct-count check would double the
    // operator's cost, so it is the documented contract, the
    // packByTokenBudget convention); NULL ids never leak — groupBy
    // would collate every keyless row into one garbage vector
    val feats = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
      array(featureCols.map(c =>
        // NULL's missing-marker is the bare column name — no real
        // value can produce it, since every present value renders as
        // "col=value" (coalescing NULL to "" would collapse it onto
        // the legitimate empty-string value, erasing the missingness
        // signal the doc promises)
        when(col(c).isNull, lit(c))
          .otherwise(concat(lit(s"$c="), col(c).cast("string")))): _*)
        .as("__fs"))
      .select(col("__id"), explode(col("__fs")).as("__f"))
    feats
      .select(col("__id"),
        pmod(Text.md5Long63(col("__f")), lit(dim.toLong)).as("__idx"))
      .groupBy(col("__id"), col("__idx"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_features"),
        array_join(transform(
          sort_array(collect_list(struct(col("__idx"), col("__c")))),
          s => concat(s.getField("__idx").cast("string"), lit(":"),
            s.getField("__c").cast("string"))), ",").as("features"))
      .withColumnRenamed("__id", idCol)
  }
  /** Per-group mean imputation: fill NULLs in a numeric column with
    * the group's mean over OBSERVED values — the standard feature-prep
    * step before models that cannot eat NULLs, grouped so a sparse
    * segment borrows from its own distribution, not the global one.
    * The mean is the exact-decimal portable contract (portableRound6
    * quantizes inputs so they sum exactly in decimal; one final
    * division, portableRound6 again — both rounds the engine-portable
    * floor-chain, since a 6dp-quantized sum over a small count is
    * exactly the cross-engine ROUND-tie hot shape the r9 sf0.1
    * incident pinned, see Num.portableRound6); the tiny per-group stats
    * frame broadcasts back, the fill is map-side — the rows never
    * shuffle. A group with NO observed values keeps its NULLs (no
    * mean exists — silence would fabricate data); `was_imputed`
    * records provenance. Adds (<c>_filled, was_imputed).
    */
  def imputeWithGroupMean(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val outCol = s"${valueCol}_filled"
    Seq(outCol, "was_imputed", "__g", "__gmean").foreach(c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with imputeWithGroupMean's columns"))
    // NaN is MISSING here, like NULL: unguarded, cast(NaN as decimal)
    // kills the aggregate under ANSI (non-ANSI: a silently biased
    // mean), and coalesce(NaN, mean) would keep NaN un-imputed — the
    // one value the downstream models can eat even less than NULL.
    // ±Inf and finite over-magnitude (>= 1e26, the DECIMAL(38,12)
    // ceiling) are the same class: isnan(Inf) is false, so they passed
    // the old guard and the decimal cast killed the whole imputation
    // job — a value no model can eat is missing, and gets imputed.
    val missing = !graft.functions.Num.finiteWithin(
      col(valueCol).cast("double"), 9e25)
    val stats = df.filter(!missing)
      .groupBy(col(groupCol).as("__g"))
      .agg(graft.functions.Num.portableRound6(
        sum(graft.functions.Num.portableRound6(col(valueCol))
          .cast(DecimalType(38, 12))).cast("double")
        / count(lit(1))).as("__gmean"))
    df.join(broadcast(stats), col(groupCol) <=> col("__g"), "left")
      .withColumn(outCol, when(missing, col("__gmean")).otherwise(col(valueCol)))
      .withColumn("was_imputed", missing && col("__gmean").isNotNull)
      .drop("__g", "__gmean")
  }
}
