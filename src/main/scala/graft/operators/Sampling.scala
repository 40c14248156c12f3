package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * `rand()`-based sampling is unstable: re-runs, retries, and different
  * cluster sizes all reshuffle which rows land in a split, which makes
  * train/holdout leakage silent and experiments unrepeatable. Hashing a
  * stable KEY instead gives every row a permanent bucket — the same doc
  * lands in the same split on every engine, every run, at every scale —
  * and the whole transform is a map-side codegen'd projection: no
  * shuffle, no state, scan-speed at 100 TB.
  *
  * Buckets come from the md5-derived 63-bit hash ([[Text.md5Long63]]),
  * so any engine with md5 reproduces the assignment bit-for-bit (the
  * DuckDB oracle does; the 63-bit mask keeps signed/unsigned modulo in
  * agreement across engines).
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a key column (hashed via its
    * canonical string form, so long and string keys agree across
    * engines). A NULL key yields a NULL bucket: `sampleByHash` then
    * DROPS the row (null fails every comparison) and `hashSplit` sends
    * it to "holdout" — a keyless row must never leak into training
    * data, and both outcomes are deterministic.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column = {
    require(buckets > 0)
    pmod(Text.md5Long63(key.cast("string")), lit(buckets.toLong))
  }

  /** Deterministic fraction sample: keeps rows whose bucket falls below
    * `pct` of 100. Approximately pct% of rows for a well-spread key,
    * exactly the same rows every run.
    */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(hashBucket(col(keyCol)) < pct)
  }

  /** Train/holdout split assignment: adds (bucket, split) columns with
    * `trainPct` buckets of 100 going to "train" and the rest to
    * "holdout". Membership is a pure function of the key — growing the
    * corpus never reassigns an existing row.
    */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100,
      s"trainPct must be in [0,100], got $trainPct")
    df.withColumn("bucket", hashBucket(col(keyCol)))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train")).otherwise(lit("holdout")))
  }
}
