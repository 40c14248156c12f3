package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

class LangModelSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "x")).toDF("doc_id", "text")
  }

  test("train: exact counts, deterministic top-V cut, vocab-pruned bigrams") {
    val m = LangModel.train(corpus, "text", vocabSize = 10, bigramSize = 10)
    assert(m.totalTokens === 8L)
    assert(m.unigrams === Map("a" -> 3L, "b" -> 3L, "c" -> 1L, "x" -> 1L))
    assert(m.bigrams === Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  test("train: vocabulary cut prunes bigrams BEFORE the count shuffle") {
    val m = LangModel.train(corpus, "text", vocabSize = 2, bigramSize = 10)
    assert(m.unigrams.keySet === Set("a", "b")) // ties broken by token asc
    assert(m.bigrams === Map("a b" -> 3L, "b a" -> 1L)) // "b c": c pruned
  }

  test("scoreDocs: retained / backoff / OOV channels, hand-computed") {
    val m = LangModel.train(corpus, "text", vocabSize = 10, bigramSize = 10)
    val out = rows(LangModel.scoreDocs(corpus, "doc_id", "text", m)
      .orderBy(col("doc_id")))
    // doc 1 "a b a b": ln(3/3) + ln(1/3) + ln(3/3) over 3 pairs
    assert(out(0).getInt(1) === 4)
    assert(math.abs(out(0).getDouble(2) - math.rint(math.log(1.0 / 3) / 3 * 1e6) / 1e6) < 1e-9)
    // doc 2 "a b c": ln(3/3) + ln(1/3) over 2 pairs
    assert(math.abs(out(1).getDouble(2) - math.rint(math.log(1.0 / 3) / 2 * 1e6) / 1e6) < 1e-9)
    // doc 3 single token: no bigram, NULL score
    assert(out(2).getInt(1) === 1 && out(2).isNullAt(2))
  }

  test("scoreDocs: backoff to unigram and OOV floor under a tight model") {
    // vocab {a, b}; bigram model holds only "a b" (top-1 cut)
    val m = LangModel.train(corpus, "text", vocabSize = 2, bigramSize = 1)
    val out = rows(LangModel.scoreDocs(corpus, "doc_id", "text", m)
      .orderBy(col("doc_id")))
    val lnAB = math.log(3.0 / 3)          // retained bigram
    val lnBackA = math.log(0.4 * 3 / 8)   // "b a" dropped -> backoff to c(a)
    val lnOov = math.log(0.4 / 8)         // "b c": c out of vocab
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(math.abs(out(0).getDouble(2) - r6((lnAB + lnBackA + lnAB) / 3)) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - r6((lnAB + lnOov) / 2)) < 1e-9)
  }

  test("score is one map-side pass: no shuffle in the scoring plan") {
    val m = LangModel.train(corpus, "text", vocabSize = 10, bigramSize = 10)
    val p = planString(LangModel.scoreDocs(corpus, "doc_id", "text", m))
    assert(!p.contains("Exchange"), s"scoring must not shuffle:\n$p")
  }

  test("boundary: broadcast-membership training path == literal path") {
    // Requested sizes straddle LiteralCap; the tiny corpus retains the
    // same vocabulary either way, so the two membership filters must
    // produce the identical model (the soft-ceiling contract).
    val lit = LangModel.train(corpus, "text",
      vocabSize = LangModel.LiteralCap, bigramSize = 10)
    val bc = LangModel.train(corpus, "text",
      vocabSize = LangModel.LiteralCap + 1, bigramSize = 10)
    assert(bc === lit)
  }

  test("scoreDocsBcast: bit-identical to scoreDocs, still zero-shuffle") {
    val m = LangModel.train(corpus, "text", vocabSize = 2, bigramSize = 1)
    val viaLit = rows(LangModel.scoreDocs(corpus, "doc_id", "text", m)
      .orderBy(col("doc_id")))
    val viaBc = rows(LangModel.scoreDocsBcast(corpus, "doc_id", "text", m)
      .orderBy(col("doc_id")))
    assert(viaBc === viaLit)
    val p = planString(LangModel.scoreDocsBcast(corpus, "doc_id", "text", m))
    assert(!p.contains("Exchange"), s"bcast scoring must not shuffle:\n$p")
  }
}
