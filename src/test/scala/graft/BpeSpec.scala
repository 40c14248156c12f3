package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {

  test("applyMerge: greedy left-to-right, overlap runs merge 1st/3rd/...") {
    assert(Bpe.applyMerge(Seq("a", "b", "c"), "a", "b") === Seq("ab", "c"))
    // adjacent repeats: [a,b,a,b] merges BOTH non-overlapping pairs
    assert(Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    // overlapping run: "a a a" under (a,a) merges only the first pair
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a")
      === Seq("aa", "aa"))
    // no occurrence: unchanged
    assert(Bpe.applyMerge(Seq("x", "y"), "a", "b") === Seq("x", "y"))
  }

  test("trainMerges: hand-computed merges with deterministic tie-break") {
    import spark.implicits._
    // words: {abab: 3, ab: 2}. pairs over chars — (a,b): 2 per "abab"
    // x3 + 1 per "ab" x2 = 8; (b,a): 1x3 = 3. merge 1 = ab. After
    // applying: abab -> [ab, ab], ab -> [ab]; round 2 pairs:
    // (ab, ab): 3 -> merge 2 = abab.
    val docs = Seq(
      (1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val out = rows(Bpe.trainMerges(docs, "text", k = 2).orderBy(col("rank")))
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out === Seq(
      (1, "a", "b", "ab", 8L),
      (2, "ab", "ab", "abab", 3L)))
  }

  test("trainMerges: stops early when no adjacent pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // all 1-char words
    assert(rows(Bpe.trainMerges(docs, "text", k = 3)).isEmpty)
  }

  test("trainMerges: count-tie breaks on ascending pair string") {
    import spark.implicits._
    // "xy" x2 and "ab" x2: both pairs count 2 -> "a b" < "x y" wins
    val docs = Seq((1L, "xy xy ab ab")).toDF("doc_id", "text")
    val first = rows(Bpe.trainMerges(docs, "text", k = 1)).head
    assert(first.getString(1) === "a" && first.getString(2) === "b")
  }

  test("trainMergesBatched: batch=1 is bit-identical to the exact greedy") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab abab abab ab ab cd cd cde"),
      (2L, "the cat sat on the mat the cat")).toDF("doc_id", "text")
    val exact = rows(Bpe.trainMerges(docs, "text", k = 6)
      .orderBy(col("rank"))).map(_.toSeq)
    val batchedRows = rows(
      Bpe.trainMergesBatched(docs, "text", k = 6, batch = 1)
        .orderBy(col("rank")))
    assert(batchedRows.map(r => r.toSeq.patch(1, Nil, 1)) === exact)
    // at batch=1 every round holds exactly one pick: round == rank
    assert(batchedRows.forall(r => r.getInt(1) === r.getInt(0)))
  }

  test("trainMergesBatched: same-round picks are symbol- AND output-disjoint") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab abab ab xy xy xy qr qr st st uv"),
      (2L, "the cat sat on the mat the rat")).toDF("doc_id", "text")
    val out = rows(Bpe.trainMergesBatched(docs, "text", k = 8, batch = 4)
      .orderBy(col("rank")))
      .map(r => (r.getInt(0), r.getInt(1),
        r.getString(2), r.getString(3), r.getString(4)))
    assert(out.nonEmpty && out.map(_._1) === (1 to out.size))
    // within each round, every pick's {x, y, merged} must be pairwise
    // disjoint from every other pick's (the commutativity contract)
    out.groupBy(_._2).values.foreach { round =>
      val symSets = round.map { case (_, _, x, y, m) => Set(x, y, m) }
      for (i <- symSets.indices; j <- symSets.indices if i < j)
        assert(symSets(i).intersect(symSets(j)).isEmpty,
          s"round picks overlap: ${round(i)} vs ${round(j)}")
    }
  }

  test("trainMergesBatched: first pick of each round is the true argmax") {
    import spark.implicits._
    // batch=2 over the hand-computed corpus: pick 1 must equal the
    // exact greedy's merge 1 (same pre-round counts, no exclusions)
    val docs = Seq((1L, "abab abab abab ab ab")).toDF("doc_id", "text")
    val b = rows(Bpe.trainMergesBatched(docs, "text", k = 2, batch = 2)
      .orderBy(col("rank")))
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    assert(b.head === ((1, 1, "a", "b", "ab", 8L)))
    // pick 2 ranks by PRE-round counts among pairs disjoint from
    // {a, b, ab}: only (b,a)=3 exists and contains a/b -> round 1
    // ends after one pick; round 2 then merges (ab, ab)
    assert(b(1) === ((2, 2, "ab", "ab", "abab", 3L)))
  }
}
