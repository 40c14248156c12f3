package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for q_dedup_prefix (r12): times each
  * sub-pipeline of Dedup.prefixFilterPairsShingled with the noop sink
  * so the 13 s-CPU stages get attributed to an operator, not guessed.
  * Not part of any query path.
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Harness.newSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val t0 = System.nanoTime()
    def lap(tag: String, df: DataFrame): Unit = {
      val t = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t) / 1e9}%7.3f s")
    }
    val threshold = 0.4
    val withShingles = graft.operators.Dedup.withShingles(
      graft.queries.QueryUtil.table(spark, sfDir, "documents"), 3)
      .localCheckpoint() // isolate: downstream timings exclude shingling

    val index = withShingles.select(col("doc_id"), explode(col("sh")).as("shingle"))
    lap("index", index)
    val dfW = Window.partitionBy(col("shingle"))
    val docW = Window.partitionBy(col("doc_id"))
    val docOrd = docW.orderBy(col("df"), col("shingle"))
    val prefixLen = (col("n_sh") -
      ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + 1).cast("int")
    val prefixIndex = index
      .withColumn("df", count(lit(1)).over(dfW))
      .withColumn("n_sh", count(lit(1)).over(docW))
      .withColumn("__rn", row_number().over(docOrd))
      .filter(col("__rn") <= prefixLen)
      .select(col("doc_id"), col("n_sh"), xxhash64(col("shingle")).as("shingle"))
    lap("prefixIndex", prefixIndex)
    val candidates = prefixIndex.as("x").join(prefixIndex.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id") &&
        col("x.n_sh").cast("double") >=
          lit(threshold) * col("y.n_sh") - lit(1e-9) &&
        col("y.n_sh").cast("double") >=
          lit(threshold) * col("x.n_sh") - lit(1e-9))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("__n"))
      .drop("__n")
    lap("candidates", candidates)
    val cachedCand = candidates.localCheckpoint()
    println(s"[probe] n_candidates ${cachedCand.count()}")
    val verified = cachedCand
      .join(withShingles.as("a"), col("doc_a") === col("a.doc_id"))
      .join(withShingles.as("b"), col("doc_b") === col("b.doc_id"))
      .withColumn("jaccard",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        graft.functions.Num.portableRound6(col("jaccard")).as("jaccard"))
    lap("verify(from cached cands)", verified)
    // second pass, warm
    lap("prefixIndex warm", prefixIndex)
    lap("candidates warm", candidates)
    lap("verify warm", verified)

    // The orderBy tail: RangePartitioning's sampling job recomputes
    // the whole child once before the real pass — A/B the fixes.
    val full = graft.operators.Dedup.prefixFilterPairsShingled(
      withShingles, threshold)
    lap("full unordered", full)
    lap("full orderBy", full.orderBy(col("doc_a"), col("doc_b")))
    lap("full repart1+sortWithin",
      full.repartition(1).sortWithinPartitions(col("doc_a"), col("doc_b")))
    lap("full lazyCkpt+orderBy",
      full.localCheckpoint(false).orderBy(col("doc_a"), col("doc_b")))
    lap("full orderBy again", full.orderBy(col("doc_a"), col("doc_b")))
    // Kernel isolation: materialize the joined sorted-array pairs,
    // then time ONLY the per-pair expressions.
    val aS = withShingles.select(col("doc_id"), array_sort(col("sh")).as("sh"))
    val joined = cachedCand
      .join(aS.as("a"), col("doc_a") === col("a.doc_id"))
      .join(aS.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        col("a.sh").as("sa"), col("b.sh").as("sb"))
      .localCheckpoint()
    println(s"[probe] joined rows ${joined.count()}")
    lap("kernel builtin intersect/union", joined.select(col("doc_a"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb")))).as("j")))
    lap("kernel merge count", joined.select(col("doc_a"),
      graft.functions.SortedArrayCommonCount(col("sa"), col("sb")).as("c")))
    lap("kernel merge count again", joined.select(col("doc_a"),
      graft.functions.SortedArrayCommonCount(col("sa"), col("sb")).as("c")))
    lap("kernel builtin again", joined.select(col("doc_a"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb")))).as("j")))
    println(f"[probe] total ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    spark.stop()
  }
}
