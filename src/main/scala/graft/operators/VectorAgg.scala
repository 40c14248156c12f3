package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Grouped embedding aggregation: per-group mean vectors (class
  * prototypes / cluster summaries — the building block behind
  * prototype classifiers, per-source drift monitoring, and seeding
  * k-means from labeled data).
  *
  * Scale shape: posexplode → ONE partially-combined (group, dim)
  * aggregate — groups·dim result rows cross the wire regardless of
  * corpus size, and the corpus itself is never shuffled (the
  * [[KMeans]] update-step shape, exposed as a standalone operator).
  *
  * Portability: each component is `round(decimalSum(round(x, 6)) / n,
  * 6)` cast to float — exact decimal accumulation (double sums are
  * partition-order dependent) with 6-place quantization, so an
  * external engine replays every component bit-for-bit.
  */
object VectorAgg {

  /** Mean vector per group, flattened to (group, n_vecs, pos, comp)
    * rows — the shape an oracle checks element-by-element and a
    * warehouse stores next to the corpus. NULL group keys form their
    * own group (engines agree on GROUP BY NULL).
    */
  def meanVectors(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(
        count(lit(1)).as("n_vecs"),
        (sum(round(col("x").cast("double"), 6).cast(DecimalType(38, 12)))
          .cast("double") / count(lit(1))).as("m"))
      .select(col(groupCol), col("n_vecs"), col("pos"),
        round(col("m"), 6).cast("float").as("comp"))
}
