package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular per-key event
  * stream onto a fixed-interval spine, carrying the last observation
  * forward (LOCF) across gaps — the transform that turns sensor/feed
  * data (the reference's vélib snapshots are exactly this shape) into
  * the aligned matrix every downstream aggregate/model expects.
  *
  * Steps, all engine-portable:
  *  1. bucket observations to the step grid (integer floor-div on epoch
  *     seconds), keep the LAST observation per (key, bucket) —
  *     deterministic tie-break on (ts, value) descending;
  *  2. per-key spine = sequence(min bucket, max bucket) — generated
  *     map-side from one tiny per-key extent aggregate, NOT a global
  *     calendar cross join (a key active for a day doesn't pay for the
  *     corpus's full year);
  *  3. left-join observations onto the spine and fill with
  *     last-ignore-nulls over a running ROWS frame.
  *
  * Scale shape: one shuffle for the per-bucket dedup window, one tiny
  * extent aggregate, one equi-join on (key, bucket), one window on key
  * — each partitioned by the series key, so a 100 TB corpus of many
  * short series parallelizes per key. Dense spines (tiny step × long
  * extent) multiply rows by extent/step — caller's knob, documented.
  *
  * Leading buckets before a key's first observation cannot be filled
  * (nothing to carry) — the spine starts at each key's first bucket,
  * so the filled column is never null.
  */
object GapFill {

  def fillGaps(
      df: DataFrame, key: String, tsCol: String, valCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val reserved = Seq("__gf_bucket", "__gf_rn")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input already has a column named $c (reserved)"))

    val bucket = timestamp_seconds(
      floor(unix_timestamp(col(tsCol)) / stepSeconds).cast("long") * stepSeconds)
    val perBucket = Window.partitionBy(col(key), col("__gf_bucket"))
      .orderBy(col(tsCol).desc, col(valCol).desc)
    val obs = df
      .withColumn("__gf_bucket", bucket)
      .withColumn("__gf_rn", row_number().over(perBucket))
      .filter(col("__gf_rn") === 1)
      .select(col(key), col("__gf_bucket"), col(valCol))

    val spine = obs.groupBy(col(key))
      .agg(min(col("__gf_bucket")).as("__gf_lo"), max(col("__gf_bucket")).as("__gf_hi"))
      .select(col(key), explode(sequence(col("__gf_lo"), col("__gf_hi"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("__gf_bucket"))

    val locf = Window.partitionBy(col(key)).orderBy(col("__gf_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq(key, "__gf_bucket"), "left")
      .select(col(key), col("__gf_bucket").as("bucket"),
        last(col(valCol), ignoreNulls = true).over(locf).as(s"${valCol}_filled"),
        col(valCol).isNotNull.as("observed"))
  }
}
