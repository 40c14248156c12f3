package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkTestBase {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSplit is a pure function of the key: invariant to partitioning and corpus growth") {
    def assign(df: org.apache.spark.sql.DataFrame) =
      rows(Sampling.hashSplit(df, "doc_id", 90)
        .select(col("doc_id"), col("split")).orderBy(col("doc_id")))
        .map(r => r.getLong(0) -> r.getString(1))
    val full = assign(docs)
    assert(assign(docs.repartition(13)) === full)
    // a smaller corpus assigns every shared row identically — growth
    // never reassigns (no leakage when the corpus is extended)
    val subset = assign(docs.filter(col("doc_id") < 100)).toMap
    assert(full.filter(_._1 < 100).forall { case (id, s) => subset(id) == s })
  }

  test("sampleByHash keeps exactly the rows below the bucket threshold") {
    val sampled = rows(Sampling.sampleByHash(docs, "doc_id", 10)
      .select(col("doc_id"))).map(_.getLong(0)).toSet
    val byBucket = rows(Sampling.hashSplit(docs, "doc_id", 10)
      .filter(col("split") === "train").select(col("doc_id")))
      .map(_.getLong(0)).toSet
    assert(sampled === byBucket)
    // a well-spread key lands near the target fraction
    val n = docs.count().toDouble
    assert(sampled.size / n > 0.04 && sampled.size / n < 0.2)
  }

  test("buckets are non-negative and bounded") {
    val b = rows(docs.select(Sampling.hashBucket(col("doc_id")).as("b"))
      .agg(min(col("b")), max(col("b")))).head
    assert(b.getLong(0) >= 0L && b.getLong(1) < 100L)
  }
}
