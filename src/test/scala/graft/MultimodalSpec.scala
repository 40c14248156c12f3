package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing: binary columns, mapPartitions batch decode,
  * frame-sampling explode. The decode kernel is the documented
  * deterministic stub; what's under test is the Spark-side contract.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"),
    (2L, "a much longer document body with many more bytes in it"),
    (3L, "x")
  ).toDF("doc_id", "text")

  test("withBinaryPayload produces a binary column of the utf-8 bytes") {
    val df = Multimodal.withBinaryPayload(docs)
    assert(df.schema("payload").dataType.typeName === "binary")
    val r = rows(df.filter(col("doc_id") === 1L)).head
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "hello world")
  }

  test("decodeMeta: one metadata row per payload, deterministic dims, real sha256") {
    val meta = Multimodal.decodeMeta(spark, Multimodal.withBinaryPayload(docs))
    val m = meta.collect().map(x => x.doc_id -> x).toMap
    assert(m.size === 3)
    assert(m(1L).n_bytes === 11)
    assert(m(1L).width === 64 + 11 % 512 && m(1L).n_frames === 1 + 11 % 16)
    // sha256 of "hello world" (well-known digest)
    assert(m(1L).sha256_hex ===
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
  }

  test("resize fits the bounding box, preserves aspect, scales bytes with area") {
    val out = Multimodal.resize(spark, Multimodal.withBinaryPayload(docs), maxDim = 64)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.size === 3)
    docs.collect().foreach { d =>
      val n = d.getString(1).getBytes("UTF-8").length
      val (w, h, _) = Multimodal.fakeDecode(d.getString(1).getBytes("UTF-8"))
      val r = out(d.getLong(0))
      assert(math.max(r.width, r.height) <= 64) // fits the box either way
      assert(r.width <= w && r.height <= h)     // never upscales
      assert(r.payload.length ===
        math.max(1, (n.toLong * r.width * r.height / (w.toLong * h)).toInt))
    }
    // payload is a prefix of the original bytes (stub kernel contract)
    val one = out(1L)
    assert(new String(one.payload, "UTF-8") ===
      "hello world".take(one.payload.length))
  }

  test("sampleFrames explodes stride-sampled frame indices") {
    val meta = Multimodal.decodeMeta(spark, Multimodal.withBinaryPayload(docs))
    val frames = Multimodal.sampleFrames(meta, stride = 4)
    val byDoc = rows(frames).groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getInt(1)).sorted).toMap
    assert(byDoc(1L) === Seq(0, 4, 8)) // n_frames = 12 -> 0,4,8
    assert(byDoc(3L) === Seq(0))       // n_frames = 2  -> 0
  }

  test("extractFeatures: fixed-dim unit-range vectors, deterministic, ANN-composable") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = Multimodal.extractFeatures(
      spark, Multimodal.withBinaryPayload(docs), dim = 8).toDF()
    val rowsA = feats.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(rowsA.nonEmpty && rowsA.values.forall(v =>
      v.length == 8 && v.forall(x => x >= 0.0f && x < 1.0f)))
    // pure function of the payload: identical under repartitioning
    val rowsB = Multimodal.extractFeatures(
      spark, Multimodal.withBinaryPayload(docs.repartition(7)), dim = 8)
      .toDF().collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(rowsB === rowsA)
    // the output conforms to the embedding contract: feed it straight
    // into the similarity tier (multimodal -> embedding -> ANN)
    val corpus = feats.select(col("doc_id").as("id"), col("features").as("vec"))
    val probes = corpus.filter(col("id") < 2)
      .select(col("id").as("probe_id"), col("vec"))
    val nn = graft.operators.Similarity.bruteForceTopK(corpus, probes, 5)
    val counts = nn.groupBy(col("probe_id")).count().collect()
    assert(counts.length === 2 && counts.forall(_.getLong(1) === 5L))
  }
  test("perceptualHash is 63-bit deterministic; duplicates pair at hamming 0") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"),
      (4L, "delta epsilon zeta")).toDF("doc_id", "text")
    val h = rows(Multimodal.perceptualHash(
      spark, Multimodal.withBinaryPayload(docs)).toDF().orderBy(col("doc_id")))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(h.forall(_._2 >= 0L))            // bit 63 never set
    assert(h(0)._2 === h(1)._2)             // same payload, same hash
    assert(h(0)._2 !== h(2)._2)
    val again = rows(Multimodal.perceptualHash(
      spark, Multimodal.withBinaryPayload(docs.repartition(3))).toDF()
      .orderBy(col("doc_id"))).map(r => (r.getLong(0), r.getLong(1)))
    assert(again === h)                     // layout-independent
    val pairs = rows(Multimodal.nearDuplicateMedia(
      spark, Multimodal.withBinaryPayload(docs), maxHamming = 3))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs === Seq((1L, 2L, 0)))      // only the true duplicate pair
  }
}
