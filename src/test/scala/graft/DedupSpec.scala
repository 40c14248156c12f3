package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),          // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"),        // near dup of 1
    (4L, "completely different content about spark and scala"),
    (5L, "another unrelated document mentioning nothing similar")
  ).toDF("doc_id", "text")

  test("shingles: n-grams are distinct and empty for short docs") {
    val sh = rows(docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh")))
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).head === "the quick brown")
    assert(sh(1L).size === 7) // 9 tokens -> 7 trigrams, all distinct here
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
    val s2 = rows(short.select(Dedup.shingles(col("text"), 3))).head.getSeq[String](0)
    assert(s2.isEmpty)
  }

  test("exactDuplicateGroups: one group per distinct content, min id kept") {
    val g = rows(Dedup.exactDuplicateGroups(docs))
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(g(1L) === 2) // docs 1+2 collapse
    assert(g(3L) === 1)
    assert(g.size === 4)
  }

  test("minhash LSH finds the exact and near duplicates, verified by true jaccard") {
    val pairs = rows(Dedup.minhashNearDuplicates(docs, 0.5))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L))) // identical: jaccard 1.0
    assert(keys.contains((1L, 3L)) && keys.contains((2L, 3L))) // near
    assert(pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 === 1.0)
    // nothing unrelated sneaks in
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L))
  }

  test("ngramJaccardPairs computes exact jaccard on trigrams") {
    val pairs = rows(Dedup.ngramJaccardPairs(docs, 3, 0.3))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 1.0)
    // doc1 vs doc3: 7 trigrams each, "lazy"->"sleepy" touches 2 of them
    // -> common = 5, union = 9 -> 5/9 rounded to 6 places
    assert(pairs((1L, 3L)) === 0.555556)
  }

  test("document-frequency cap drops hot shingles from candidate generation") {
    // every doc shares one hot trigram; without the cap the self-join
    // produces candidates for all C(6,2) pairs through that key
    val hot = Seq(
      (1L, "click here to buy cheap watches now online"),
      (2L, "click here to find the best deals today"),
      (3L, "click here to read the full story online"),
      (4L, "click here to start your free trial today"),
      (5L, "click here to download the latest update now"),
      (6L, "click here to join our mailing list today")
    ).toDF("doc_id", "text")
    // cap of 5 kills the universal "click here to" shingle; remaining
    // overlaps are tiny, so a 0.3 threshold yields no pairs
    val capped = Dedup.ngramJaccardPairs(hot, 3, 0.3, maxDocFreq = 5)
    assert(rows(capped).isEmpty)
    // sanity: with a loose cap the hot shingle connects everything at
    // low thresholds
    val loose = Dedup.ngramJaccardPairs(hot, 3, 0.05, maxDocFreq = 1000)
    assert(rows(loose).nonEmpty)
  }

  test("prefix filtering recovers exactly the inverted-index pair set") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    for (t <- Seq(0.3, 0.4, 0.5, 0.8)) {
      val pf = rows(Dedup.prefixFilterPairs(d, 3, t)
        .orderBy(col("doc_a"), col("doc_b"))).map(key)
      val exact = rows(Dedup.ngramJaccardPairs(d, 3, t)
        .orderBy(col("doc_a"), col("doc_b"))).map(key)
      assert(pf === exact, s"threshold $t")
    }
  }

  test("prefix filtering stays exact on a universal hot shingle") {
    // the corpus where the df cap loses pairs: every doc shares one hot
    // trigram; prefix filtering orders it LAST (highest df) so it is
    // indexed only by docs whose prefix reaches it — and the pair set
    // still matches the exact miner at every threshold
    val hot = Seq(
      (1L, "click here to buy cheap watches now online"),
      (2L, "click here to buy cheap watches now today"),
      (3L, "click here to read the full story online"),
      (4L, "click here to read the full story today"),
      (5L, "click here to download the latest update now"),
      (6L, "click here to join our mailing list today")
    ).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    for (t <- Seq(0.1, 0.3, 0.5, 0.7)) {
      val pf = rows(Dedup.prefixFilterPairs(hot, 3, t)
        .orderBy(col("doc_a"), col("doc_b"))).map(key)
      val exact = rows(Dedup.ngramJaccardPairs(hot, 3, t)
        .orderBy(col("doc_a"), col("doc_b"))).map(key)
      assert(pf === exact, s"threshold $t")
    }
  }

  test("semanticDedup drops the higher id of an in-cluster near-pair") {
    val centroids = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f))
    ).toDF("centroid_id", "vec")
    val embs = Seq(
      (10L, Seq(1.0f, 0.01f)),   // cluster 0, kept (lowest id wins)
      (11L, Seq(1.0f, 0.02f)),   // cluster 0, cos(10,11) ~ 1 -> dropped
      (12L, Seq(0.0f, 1.0f)),    // cluster 1, alone -> kept
      (13L, Seq(0.9f, 0.45f))    // cluster 0, cos to 10 ~ 0.9 -> kept at eps .99
    ).toDF("id", "vec")
    val out = rows(Dedup.semanticDedup(embs, centroids, 0.99)
      .orderBy(col("id"))).map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Seq((10L, 0L), (12L, 1L), (13L, 0L)))
  }

  test("semanticDedup never pairs across clusters") {
    val centroids = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f))
    ).toDF("centroid_id", "vec")
    // 20 and 21 are nearly identical but land in different clusters
    // (epsilon off either axis), so neither is dropped
    val embs = Seq(
      (20L, Seq(1.0f, 0.99f)), (21L, Seq(0.99f, 1.0f))
    ).toDF("id", "vec")
    val out = rows(Dedup.semanticDedup(embs, centroids, 0.5)
      .orderBy(col("id"))).map(_.getLong(0))
    assert(out === Seq(20L, 21L))
  }

  test("incremental minhash dedup equals the full dedup restricted to cross-boundary pairs") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val inc = rows(Dedup.minhashNearDuplicatesAgainst(
      d.filter(col("doc_id") < 400), d.filter(col("doc_id") >= 400), 0.8)
      .orderBy(col("doc_a"), col("doc_b"))).map(key)
    val full = rows(Dedup.minhashNearDuplicates(d, 0.8)
      .orderBy(col("doc_a"), col("doc_b")))
      .filter(r => r.getLong(0) < 400 && r.getLong(1) >= 400).map(key)
    assert(inc.nonEmpty) // the corpus plants near-dups across the split
    assert(inc === full)
  }

  test("decontaminate drops exact-normalized AND near-duplicate leaks, keeps the rest") {
    val corpus = Seq(
      (1L, "The Quick, Brown Fox jumps over the lazy dog!"), // normalized dup of eval 10
      (2L, "the quick brown fox jumps over the sleepy dog"), // near-dup of eval 10
      (3L, "completely different content about spark and scala engines")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val kept = rows(Dedup.decontaminate(corpus, eval_, 0.3)
      .select(col("doc_id")).orderBy(col("doc_id"))).map(_.getLong(0))
    assert(kept === Seq(3L))
  }

  test("decontaminate catches a leak whose corpus and eval ids collide") {
    // two independent datasets both numbering from 0: the near-dup
    // channel's defensive same-id guard (minhashNearDuplicatesAgainst)
    // skipped the (17, 17) pair, shipping the contaminated doc as
    // clean — eval ids are now remapped to the negative domain first
    val corpus = Seq(
      (17L, "the quick brown fox jumps over the sleepy dog"), // near-dup of eval 17
      (18L, "completely different content about spark and scala engines")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (17L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val kept = rows(Dedup.decontaminate(corpus, eval_, 0.3)
      .select(col("doc_id")).orderBy(col("doc_id"))).map(_.getLong(0))
    assert(kept === Seq(18L))
  }

  test("decontaminateNgrams drops partial leaks whole-doc channels miss") {
    val corpus = Seq(
      // eval 5-gram embedded in an otherwise unrelated long page: a
      // whole-doc fingerprint or Jaccard-at-0.8 both pass it — the
      // n-gram screen must not
      (1L, "lots of unrelated page text here and the quick brown fox jumps " +
        "plus much more filler trailing content for padding the page out"),
      (2L, "completely clean document about spark catalyst optimizer rules"),
      (3L, "short doc") // fewer than n tokens: zero grams, must survive
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val kept = rows(Dedup.decontaminateNgrams(corpus, eval_, 5)
      .select(col("doc_id")).orderBy(col("doc_id"))).map(_.getLong(0))
    assert(kept === Seq(2L, 3L))
    // and the whole-doc channel indeed misses doc 1 (the screen is not
    // redundant with decontaminate)
    val wholeDoc = rows(Dedup.decontaminate(corpus, eval_, 0.8)
      .select(col("doc_id")).orderBy(col("doc_id"))).map(_.getLong(0))
    assert(wholeDoc === Seq(1L, 2L, 3L))
  }

  test("decontaminateByOverlap: tolerance keeps light overlap, drops heavy, keeps gramless") {
    // trigrams, threshold 0.5: doc 1 has 2/8 distinct grams in the
    // eval set (25% — kept); doc 2 is a verbatim eval prefix, 5/5
    // grams hit (100% — dropped); doc 3 has no trigrams (kept);
    // doc 4 is clean (kept).
    val corpus = Seq(
      (1L, "the quick brown fox then filler words continue padding onward"),
      (2L, "the quick brown fox jumps over lazy"),
      (3L, "too short"),
      (4L, "entirely unrelated catalyst optimizer discussion text")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "the quick brown fox jumps over lazy dogs sleeping")
    ).toDF("doc_id", "text")
    val kept = rows(Dedup.decontaminateByOverlap(corpus, eval_, 3, 0.5)
      .select(col("doc_id")).orderBy(col("doc_id"))).map(_.getLong(0))
    assert(kept === Seq(1L, 3L, 4L))
    // threshold 0 degenerates to the any-overlap screen
    val strict = rows(Dedup.decontaminateByOverlap(corpus, eval_, 3, 0.0)
      .select(col("doc_id")).orderBy(col("doc_id"))).map(_.getLong(0))
    val anyOverlap = rows(Dedup.decontaminateNgrams(corpus, eval_, 3)
      .select(col("doc_id")).orderBy(col("doc_id"))).map(_.getLong(0))
    assert(strict === anyOverlap)
  }

  test("simhash: identical docs share signatures; hamming pairs found via bands") {
    val sigs = rows(docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    // the aggregation-engine signature path must agree bit-for-bit with
    // the Column-expression definition
    val rowSigs = rows(Dedup.simhashSignatures(docs))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rowSigs === sigs)
    val pairs = rows(Dedup.simhashNearDuplicates(docs, 3))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    // the 4x16-bit pigeonhole only guarantees recall through hamming 3:
    // a larger threshold would silently return incomplete pairs
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashNearDuplicates(docs, 4)
    }
    assert(e.getMessage.contains("maxHamming"))
  }

  test("LSH near-dup detection is a superset filter verified against exact jaccard") {
    // every pair reported by minhashNearDuplicates must agree with the
    // exact trigram jaccard (the verification step guarantees it)
    val lsh = rows(Dedup.minhashNearDuplicates(docs, 0.3))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = rows(Dedup.ngramJaccardPairs(docs, 3, 0.3))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { case (k, j) => assert(exact(k) === j) }
  }

  private def clustersOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    rows(Dedup.duplicateClusters(pairs.toDF("doc_a", "doc_b")))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("duplicateClusters: cliques, chains, and disjoint components") {
    // two disjoint components: a triangle {1,2,3} and an edge {10,11}
    val c = clustersOf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)))
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))

    // adversarial chain 1-2-3-...-33 descending from the far end:
    // min-propagation alone needs 32 rounds; pointer jumping must pull
    // it under the 64-round cap easily and still label everything 1
    val chain = (1L until 33L).map(i => (i + 1, i))
    val cc = clustersOf(chain)
    assert(cc.size === 33 && cc.values.forall(_ == 1L))

    // empty input -> empty output, no crash
    assert(clustersOf(Seq.empty).isEmpty)
  }

  test("canonicalDocs keeps exactly one survivor per cluster plus singletons") {
    val corpus = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")
    ).toDF("doc_id", "text")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val kept = rows(Dedup.canonicalDocs(corpus, pairs)
      .select(col("doc_id")).orderBy(col("doc_id"))).map(_.getLong(0))
    assert(kept === Seq(1L, 2L, 3L)) // 4 and 5 collapse into 2
  }

  test("editDistancePairs equals brute-force lev<=1 on every edit kind") {
    // equal, substitution (first/middle/last), insertion, deletion,
    // repeated chars, 2-edits-apart decoys, empty and 1-char strings
    val keys = Seq(
      1L -> "alpha", 2L -> "alpha",    // equal
      3L -> "alphb",                   // sub at last
      4L -> "blpha",                   // sub at first
      5L -> "alpa",                    // deletion (middle)
      6L -> "alphas",                  // insertion at end
      7L -> "salpha",                  // insertion at front
      8L -> "aabb", 9L -> "abab",      // 2 edits apart — must NOT pair
      10L -> "aa", 11L -> "aaa",       // repeated chars (dup variants)
      12L -> "", 13L -> "x"            // empty vs 1-char: lev 1
    )
    val df = keys.toDF("id", "k")
    val got = rows(Dedup.editDistancePairs(df, "id", "k"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (ia, ka) <- keys; (ib, kb) <- keys if ia < ib
      d = levDist(ka, kb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got === brute)
    assert(got.contains((12L, 13L, 1)))
    assert(!got.exists { case (a, b, _) => a == 8L && b == 9L })
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
    d(a.length)(b.length)
  }

  test("containmentPairs: full sub-document containment that jaccard misses") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon"
    // small is quoted verbatim inside a much larger doc
    val big = ("zz" + (1 to 40).map(i => s" w$i").mkString) + " " + small +
      (41 to 80).map(i => s" w$i").mkString
    val docs = Seq((1L, small), (2L, big), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val out = rows(Dedup.containmentPairs(docs, 3, 0.9)
      .orderBy(col("doc_a"), col("doc_b")))
    assert(out.size === 1)
    val r = out.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0) // every trigram of small is in big
    assert(r.getDouble(3) < 0.1)   // big is NOT contained in small
    // jaccard at the same threshold finds nothing — the asymmetric
    // containment is what surfaces the quote
    assert(rows(Dedup.ngramJaccardPairs(docs, 3, 0.9)).isEmpty)
  }
}
