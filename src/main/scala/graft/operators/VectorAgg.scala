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
  * Portability: each component is
  * `portableRound6(decimalSum(portableRound6(x)) / n)` cast to float —
  * exact decimal accumulation (double sums are partition-order
  * dependent) with 6-place quantization through the shared-IEEE
  * [[graft.functions.Num.portableRound6]] (built-in ROUNDs decide
  * .5e-6 ties differently per engine — the r9 sf0.1 incident), so an
  * external engine replays every component bit-for-bit on any data.
  */
object VectorAgg {

  /** Mean vector per group, flattened to (group, n_vecs, pos, comp)
    * rows — the shape an oracle checks element-by-element and a
    * warehouse stores next to the corpus. NULL group keys form their
    * own group (engines agree on GROUP BY NULL).
    */
  def meanVectors(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    // entry guard (the Analytics/Anomaly convention): a group column
    // named like the explode/output columns would emit duplicate names
    // (groupCol = "pos" produces TWO pos columns) or die downstream in
    // AMBIGUOUS_REFERENCE
    Seq("pos", "x", "n_vecs", "m", "comp").foreach { c =>
      require(groupCol != c,
        s"group column '$c' collides with meanVectors' columns")
    }
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(
        count(lit(1)).as("n_vecs"),
        // divisor = NON-NULL elements, matching the NULL-skipping sum:
        // dividing by count(*) silently averaged NULL elements as
        // zeros, deflating every component of a group containing one
        // corrupted vector. n_vecs still counts vectors seen (the
        // report's denominator); try_divide covers the all-NULL
        // dimension (0 divisor would ANSI-abort), yielding NULL comp.
        try_divide(
          // input quantization via portableRound6 too (not just the
          // final mean): a float element's scaled multiply can land
          // exactly on .5e-6 in one engine's ROUND and not the
          // other's — same tie-convention class, lower incidence
          sum(graft.functions.Num.portableRound6(col("x").cast("double"))
            .cast(DecimalType(38, 12)))
            .cast("double"), count(col("x"))).as("m"))
      .select(col(groupCol), col("n_vecs"), col("pos"),
        // portableRound6, not round: the component mean can land
        // within an ulp of a .5e-6 boundary, where Spark's and an
        // external engine's ROUND tie conventions diverge (the r9
        // sf0.1 q_embed_centroid incident — mechanism in Num's doc);
        // the shared-IEEE form is bit-identical on any data
        graft.functions.Num.portableRound6(col("m")).cast("float").as("comp"))
  }

  /** Per-dimension z-score standardization of the corpus — the feature
    * scaling step before distance-based methods (k-means, ANN) when
    * dimensions carry different scales, and the drift-normalization
    * step when corpora from different encoders mix.
    *
    * Output is the exploded (vec_id, pos, z) form:
    * `z = round((x - mean_pos) / std_pos, 6)`, with a constant
    * dimension (std = 0) yielding NULL rather than an ANSI error.
    *
    * Scale shape: one posexplode scan feeds ONE partially-combined
    * per-dimension moment aggregate (dim result rows); the tiny stats
    * frame broadcasts back onto the exploded corpus — the corpus is
    * never shuffled.
    *
    * Portability: inputs quantize to 6 places, so both the sum and the
    * sum of squares accumulate EXACTLY in DECIMAL(38,12) (x_r² carries
    * exactly 12 decimals); mean, E[x²], `var = E[x²] - mean²`, sqrt,
    * and the final division are then single IEEE ops in a fixed order —
    * an external engine lands on identical bits (population variance,
    * the textbook replayable form; the shifted-data cancellation risk
    * is bounded by the 6-place input quantization).
    */
  def standardizeDims(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // "vec_id" itself is fine — idCol is RENAMED to it (identity
    // rename for the common vec_id input); only the explode/scratch/
    // output names it must coexist with are reserved
    Seq("pos", "x", "xr", "mean", "ex2", "std", "z").foreach { c =>
      require(idCol != c,
        s"id column '$c' collides with standardizeDims' columns")
    }
    val ex = df
      .select(col(idCol).as("vec_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"),
        round(col("x").cast("double"), 6).as("xr"))
    val stats = ex.groupBy(col("pos"))
      .agg(
        // divisor = NON-NULL elements (the meanVectors rule): count(*)
        // deflated both moments toward 0 in any dimension containing a
        // NULL element, corrupting every z-score in that dimension
        try_divide(sum(col("xr").cast(DecimalType(38, 12))).cast("double"),
          count(col("xr"))).as("mean"),
        try_divide(
          sum((col("xr") * col("xr")).cast(DecimalType(38, 12))).cast("double"),
          count(col("xr"))).as("ex2"))
      .select(col("pos"), col("mean"),
        // the two moments pass through decimal→double casts and
        // divisions, so a CONSTANT dimension's variance can land a
        // hair below zero — sqrt(negative) is NaN in Spark, and the
        // floor turns it into the documented std=0 → z NULL instead
        sqrt(greatest(col("ex2") - col("mean") * col("mean"),
          lit(0.0))).as("std"))
    ex.join(broadcast(stats), Seq("pos"))
      .select(col("vec_id"), col("pos"),
        round(try_divide(col("xr") - col("mean"), col("std")), 6).as("z"))
  }
  /** Cluster-separation report (silhouette-lite): per label, the mean
    * cosine of members to their OWN centroid vs the mean cosine to the
    * nearest FOREIGN centroid — the "are my labels actually clusters?"
    * audit run before trusting labels for leakage-free splits,
    * prototype classification, or stratified mixes. separation > 0
    * means members sit closer to home than to any rival prototype.
    *
    * Scale shape: centroids come from [[meanVectors]] (corpus never
    * shuffles; k·dim rows cross the wire), assemble into k vectors,
    * and broadcast — the scoring pass is one map-side cross join
    * against the bounded centroid table (k rows; the IVF assignment
    * idiom) followed by one per-label aggregate. Nothing all-pairs.
    *
    * Portability: centroid components are the meanVectors contract
    * (decimal-exact, 6-rounded floats); each cosine is the codegen'd
    * dot/norm chain both engines replay, rounded to 6; per-label
    * means accumulate the rounded cosines as exact decimals; the
    * separation is a single subtraction of the two rounded means.
    * Labels with no rival (k = 1) read NULL mean_other/separation.
    * Output: (label, n_vecs, mean_own_cos, mean_other_cos,
    * separation).
    */
  def clusterSeparation(
      df: DataFrame, idCol: String, labelCol: String, vecCol: String): DataFrame = {
    import graft.functions.VectorOps
    Seq("n_vecs", "mean_own_cos", "mean_other_cos", "separation").foreach { c =>
      require(labelCol != c,
        s"label column '$c' collides with clusterSeparation's outputs")
    }
    val cent = meanVectors(df, labelCol, vecCol)
      .groupBy(col(labelCol).as("__clab"))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("comp")))),
        c => c.getField("comp")).as("__cvec"))
    val scored = df
      .select(col(idCol).as("__vid"), col(labelCol).as("__lab"),
        col(vecCol).as("__v"))
      .crossJoin(broadcast(cent))
      .select(col("__vid"), col("__lab"), col("__clab"),
        round(VectorOps.cosineSimilarity(col("__v"), col("__cvec")), 6)
          .as("__cos"))
    val perVec = scored.groupBy(col("__vid"), col("__lab"))
      .agg(
        // null-safe label compares: meanVectors supports a NULL-label
        // group, and ===/=!= would give its members an all-NULL row
        // while hiding its centroid from every real label's rivals.
        // guardCos's -2.0 RANKING sentinel (NULL/zero-norm/NaN vector)
        // is excluded from the report's means — averaging an
        // impossible-cosine sentinel into mean_own_cos would shift a
        // 10-member label by ~-0.3 per corrupted member; such members
        // still count in n_vecs (they are members, just unmeasurable).
        max(when(col("__clab") <=> col("__lab")
          && col("__cos") =!= graft.functions.VectorOps.DegenerateCos,
          col("__cos"))).as("__own"),
        max(when(!(col("__clab") <=> col("__lab"))
          && col("__cos") =!= graft.functions.VectorOps.DegenerateCos,
          col("__cos"))).as("__oth"))
    perVec.groupBy(col("__lab"))
      .agg(
        count(lit(1)).as("n_vecs"),
        // portableRound6 on the per-label means (the meanVectors rule):
        // 6dp-cosine sums over small member counts are the .5e-6
        // boundary class where built-in ROUNDs tie-diverge. The
        // `separation` difference below keeps built-in round — its
        // input sits ON the 6dp grid (within an ulp), never at a half
        graft.functions.Num.portableRound6(try_divide(
          sum(col("__own").cast(DecimalType(38, 6))).cast("double"),
          count(col("__own")).cast("double"))).as("mean_own_cos"),
        graft.functions.Num.portableRound6(try_divide(
          sum(col("__oth").cast(DecimalType(38, 6))).cast("double"),
          count(col("__oth")).cast("double"))).as("mean_other_cos"))
      .select(col("__lab").as(labelCol), col("n_vecs"),
        col("mean_own_cos"), col("mean_other_cos"),
        round(col("mean_own_cos") - col("mean_other_cos"), 6)
          .as("separation"))
  }
}
