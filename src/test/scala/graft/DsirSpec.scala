package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkTestBase {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("importanceScores ranks target-language docs above the corpus at large") {
    val scored = Dsir.importanceScores(
      docs, docs.filter(col("lang") === "fr"), "doc_id", "text", buckets = 256)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val means = rows(scored.withColumn("is_fr", col("lang") === "fr")
      .groupBy(col("is_fr")).agg(avg(col("dsir_score"))))
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the target slice must score visibly above the non-target slice —
    // that separation is the entire point of importance weighting
    assert(means(true) > means(false),
      s"fr mean ${means(true)} should exceed non-fr mean ${means(false)}")
  }

  test("NULL-id corpus rows never merge into a scored pseudo-document") {
    val withNulls = docs.limit(20).unionByName(
      docs.limit(5).withColumn("doc_id", lit(null).cast("long")))
    val scored = Dsir.importanceScores(
      withNulls, docs.filter(col("lang") === "fr").limit(20),
      "doc_id", "text", buckets = 256)
    assert(rows(scored.filter(col("doc_id").isNull)).isEmpty,
      "keyless rows must be excluded, not collated into one mega-doc")
    assert(rows(scored).length === 20)
  }

  test("''-artifacts from messy whitespace never become scored buckets or counts") {
    import spark.implicits._
    // 'alpha  beta' used to count 3 tokens with a third of its score
    // from the ''-bucket ratio — pure formatting noise in a
    // vocabulary-affinity score; a whitespace-only doc got a REAL
    // score derived solely from '' and could clear a selection cutoff
    val corpus = Seq(
      (1L, "alpha  beta"), (2L, "   "), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val target = Seq(Tuple1("alpha beta")).toDF("text")
    val out = rows(Dsir.importanceScores(corpus, target, "doc_id", "text")
      .orderBy(col("doc_id")))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1) === Seq(1L, 3L),
      "the whitespace-only doc carries no tokens, so no score at all")
    assert(out(0)._2 === 2L && out(1)._2 === 2L,
      "double spaces add no phantom token")
    assert(out(0)._3 === out(1)._3,
      "formatting noise must not move the affinity score")
  }

  test("importanceScores: n_tokens matches the tokenizer and scores are partitioning-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      rows(Dsir.importanceScores(df, df.filter(col("lang") === "fr"),
        "doc_id", "text", buckets = 64)
        .orderBy(col("doc_id")))
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val base = run(docs)
    assert(run(docs.repartition(17)) === base) // exact-decimal sums: no order drift
    val tokenCounts = rows(docs.select(col("doc_id"),
      size(graft.functions.Text.tokens(col("text"))).as("n"))
      .orderBy(col("doc_id"))).map(r => r.getLong(0) -> r.getInt(1)).toMap
    base.foreach { case (id, n, _) => assert(n === tokenCounts(id).toLong) }
  }

  test("the corpus-side tokenize+shuffle runs once: AQE reuses the shared exchange") {
    val scored = Dsir.importanceScores(
      docs, docs.filter(col("lang") === "fr"), "doc_id", "text", buckets = 64)
    scored.collect()
    // src distribution, totals, and the per-doc join all roll up from
    // ONE (doc, bucket) aggregate — at runtime the identical exchange
    // is reused, not recomputed (the pre-AQE plan prints the subtree
    // per consumer; the executed plan must show the reuse)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan)
  }

  test("a neutral target (the corpus itself) scores every doc near 1.0") {
    val scored = rows(Dsir.importanceScores(docs, docs, "doc_id", "text", 256)
      .select(col("dsir_score")))
      .map(_.getDouble(0))
    // target == source makes every smoothed ratio ~1 (off only by the
    // +1/+B smoothing); scores must sit in a tight band around 1
    assert(scored.forall(s => s > 0.9 && s < 1.1),
      s"scores outside [0.9, 1.1]: ${scored.filter(s => s <= 0.9 || s >= 1.1).take(5)}")
  }

  test("selectByScore is the cutoff filter") {
    val scored = Dsir.importanceScores(
      docs, docs.filter(col("lang") === "fr"), "doc_id", "text", 256)
    val cut = 1.0
    val kept = rows(Dsir.selectByScore(scored, cut).select(col("doc_id")))
      .map(_.getLong(0)).toSet
    val expected = rows(scored.filter(col("dsir_score") >= cut)
      .select(col("doc_id"))).map(_.getLong(0)).toSet
    assert(kept === expected)
    assert(kept.nonEmpty && kept.size < docs.count())
  }
}
