package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.operators.Similarity

/** The materialized IVF index (`Similarity.ivfWritePartitioned` +
  * `ivfTopKPartitioned`): the serving path must read ONLY the routed
  * list directories (static partition pruning) and answer bit-for-bit
  * what the in-query `ivfTopK` answers with the same codebook.
  */
class IvfPartitionedSpec extends SparkTestBase {

  /** 48 deterministic 4-dim vectors spread across orthants, so the
    * 8-centroid assignment populates many distinct lists.
    */
  private def corpus = {
    import spark.implicits._
    (0L until 48L).map { i =>
      val s1 = if ((i & 1) == 0) 1.0f else -1.0f
      val s2 = if ((i & 2) == 0) 1.0f else -1.0f
      (i, Array(s1 * (1 + (i % 5)), s2 * (2 + (i % 3)),
        (i % 7).toFloat - 3f, 1f))
    }.toDF("id", "vec")
  }

  private def centroids = corpus.filter(col("id") < 8)
    .select(col("id").as("centroid_id"), col("vec"))

  private def probes = corpus.filter(col("id") >= 40)
    .select(col("id").as("probe_id"), col("vec"))

  test("persisted index answers bit-for-bit what the in-query IVF answers") {
    val idx = Files.createTempDirectory("ivf").toString + "/index"
    Similarity.ivfWritePartitioned(corpus, centroids, idx)
    val direct = rows(
      Similarity.ivfTopK(corpus, probes, centroids, k = 5, nProbe = 2)
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id")))
    val served = rows(
      Similarity.ivfTopKPartitioned(spark, idx, probes, centroids,
        k = 5, nProbe = 2)
        .orderBy(col("probe_id"), col("cos_sim").desc, col("neighbor_id")))
    assert(served === direct)
    assert(direct.nonEmpty)
  }

  test("the scan is statically pruned to the routed lists only") {
    val idx = Files.createTempDirectory("ivf").toString + "/index"
    Similarity.ivfWritePartitioned(corpus, centroids, idx)
    val totalLists = new java.io.File(idx).listFiles()
      .count(_.getName.startsWith("centroid_id="))
    assert(totalLists >= 4, s"fixture degenerated to $totalLists lists")

    // one probe at nProbe=2 routes to exactly 2 lists; the index read
    // inside the operator must carry that as a PARTITION filter (a
    // post-scan Filter would read the whole corpus at 100 TB)
    val oneProbe = probes.limit(1)
    val df = Similarity.ivfTopKPartitioned(spark, idx, oneProbe, centroids,
      k = 5, nProbe = 2)
    val ex = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(ex).map(_.group(1)).getOrElse("")
    assert(pf.contains("centroid_id") && pf.toUpperCase.contains(" IN "),
      s"routed-list predicate did not reach the scan as a partition " +
        s"filter:\n$ex")

    // and the file index actually lists only the routed directories:
    // the IN values from the operator's own partition filter, replayed
    // against a bare pruned read (AQE stages hide the scan node from
    // plan.collect, so the count is asserted on the same predicate
    // standalone)
    val inLists = "IN \\(([0-9,]+)\\)".r.findFirstMatchIn(pf).get
      .group(1).split(",").map(_.toInt)
    assert(inLists.length === 2, s"expected 2 routed lists, got $pf")
    val bare = spark.read.parquet(idx)
      .filter(col("centroid_id").isin(inLists.toIndexedSeq: _*))
    val scans = bare.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val selected = scans.head.selectedPartitions.partitionCount
    assert(selected === 2,
      s"expected 2 routed lists selected, got $selected of $totalLists")
  }
}
