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

  test("null keys are dropped by sampling and quarantined to holdout by splitting") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(2L)).toDF("doc_id")
    assert(rows(Sampling.sampleByHash(df, "doc_id", 100))
      .map(_.getLong(0)).toSet === Set(1L, 2L)) // pct=100 keeps all keyed rows
    val splits = rows(Sampling.hashSplit(df, "doc_id", 100)
      .select(col("doc_id"), col("split")))
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toMap
    assert(splits(-1L) === "holdout") // keyless row never reaches train
    assert(splits(1L) === "train" && splits(2L) === "train")
  }

  test("packByTokenBudget: batches are contiguous and overshoot by at most one doc") {
    import graft.operators.Packing
    val packed = rows(Packing.packByTokenBudget(docs, "source", "doc_id", 500)
      .select(col("source"), col("batch_id"), col("doc_id"), col("n_tokens"))
      .orderBy(col("source"), col("doc_id")))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (_, group) =>
      // batch ids are non-decreasing in doc order and start at 0
      val ids = group.map(_._2)
      assert(ids.head === 0L)
      assert(ids.zip(ids.tail).forall { case (a, b) => b == a || b == a + 1 || b > a })
      // each batch holds <= budget tokens before its last doc joined
      group.groupBy(_._2).values.foreach { batch =>
        val toks = batch.map(_._4.toLong)
        assert(toks.sum - toks.last < 500 || batch.size == 1)
      }
    }
  }

  test("concatPacked: sequences concatenate members in order, invariant to partitioning") {
    import graft.operators.Packing
    val packed = Packing.packByTokenBudget(
      docs.select(col("doc_id"), col("source"), col("text")),
      "source", "doc_id", 500)
    def run(df: org.apache.spark.sql.DataFrame) =
      rows(Packing.concatPacked(df, "source", "doc_id", " <|eos|> ")
        .orderBy(col("source"), col("batch_id")))
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
    val base = run(packed)
    // collect_list order is canonicalized in-aggregate: any partitioning
    // yields the identical sequence text
    assert(run(packed.repartition(17)) === base)
    // each sequence is exactly its members' texts joined in doc order
    val members = rows(packed.select(col("source"), col("batch_id"),
      col("doc_id"), col("text"), col("n_tokens"))
      .orderBy(col("source"), col("batch_id"), col("doc_id")))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getInt(4)))
      .groupBy(t => (t._1, t._2))
    base.foreach { case (src, bid, nDocs, nToks, seq) =>
      val m = members((src, bid)).sortBy(_._3)
      assert(nDocs === m.size.toLong)
      assert(nToks === m.map(_._5.toLong).sum)
      assert(seq === m.map(_._4).mkString(" <|eos|> "))
    }
  }

  test("capPerGroup keeps at most quota rows per group, stable under growth") {
    val capped = rows(Sampling.capPerGroup(docs, "source", "doc_id", 7)
      .select(col("source"), col("doc_id"), col("sample_rank")))
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // quota respected and ranks dense from 1
    capped.groupBy(_._1).values.foreach { g =>
      assert(g.size <= 7 && g.map(_._3).sorted == (1 to g.size))
    }
    // deterministic: same survivors on a repartitioned input
    val again = rows(Sampling.capPerGroup(docs.repartition(11), "source", "doc_id", 7)
      .select(col("source"), col("doc_id"), col("sample_rank")))
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(again.toSet === capped.toSet)
    // growth monotonicity: a kept row of a SUBSET corpus that still ranks
    // inside the quota in the full corpus is still kept with rank <= old
    val subset = rows(Sampling.capPerGroup(
      docs.filter(col("doc_id") % 2 === 0), "source", "doc_id", 7)
      .select(col("doc_id"), col("sample_rank")))
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val full = capped.map(c => c._2 -> c._3).toMap
    full.foreach { case (id, rk) =>
      if (id % 2 == 0) assert(subset.contains(id) && subset(id) <= rk)
    }
  }

  test("sampleByWeight: 0 keeps nothing, 1 keeps all, decisions stable and unbiased-ish") {
    assert(Sampling.sampleByWeight(docs, "doc_id", lit(0.0)).count() === 0)
    assert(Sampling.sampleByWeight(docs, "doc_id", lit(1.0)).count() === docs.count())
    val half = rows(Sampling.sampleByWeight(docs, "doc_id", lit(0.5))
      .select(col("doc_id"))).map(_.getLong(0)).toSet
    // deterministic under repartitioning
    val again = rows(Sampling.sampleByWeight(docs.repartition(9), "doc_id", lit(0.5))
      .select(col("doc_id"))).map(_.getLong(0)).toSet
    assert(again === half)
    // roughly half (uniform draw; corpus of a few hundred docs)
    val n = docs.count().toDouble
    assert(half.size > n * 0.35 && half.size < n * 0.65, s"${half.size} of $n")
  }

  test("buckets are non-negative and bounded") {
    val b = rows(docs.select(Sampling.hashBucket(col("doc_id")).as("b"))
      .agg(min(col("b")), max(col("b")))).head
    assert(b.getLong(0) >= 0L && b.getLong(1) < 100L)
  }

  test("negativePairs: no self-pairs, negatives come from the corpus, near-k per anchor") {
    val pairs = rows(Sampling.negativePairs(docs, "doc_id", k = 3, buckets = 32)
      .orderBy(col("doc_id"), col("neg_idx")))
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ids = rows(docs.select(col("doc_id"))).map(_.getLong(0)).toSet
    assert(pairs.forall { case (a, _, n) => a != n && ids(n) && ids(a) })
    assert(pairs.forall { case (_, i, _) => i >= 1 && i <= 3 })
    // every anchor draws 3 probes; only self-collisions and (rare at
    // 32 buckets over hundreds of docs) empty buckets reduce the count
    val perAnchor = pairs.groupBy(_._1).view.mapValues(_.size)
    assert(perAnchor.values.forall(_ <= 3))
    assert(pairs.size > ids.size * 2, s"${pairs.size} pairs for ${ids.size} anchors")
  }

  test("negativePairs is deterministic under repartitioning") {
    val a = rows(Sampling.negativePairs(docs, "doc_id", 2, 16)
      .orderBy(col("doc_id"), col("neg_idx")))
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = rows(Sampling.negativePairs(docs.repartition(11), "doc_id", 2, 16)
      .orderBy(col("doc_id"), col("neg_idx")))
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a === b)
  }

  test("negativePairs drops null anchors and rejects colliding columns") {
    import spark.implicits._
    val df = Seq(Some(1L), None, Some(2L), Some(3L)).toDF("doc_id")
    val out = rows(Sampling.negativePairs(df, "doc_id", 2, 4))
    assert(out.forall(!_.isNullAt(0)) && out.forall(!_.isNullAt(2)))
    val bad = df.toDF("neg_id")
    assertThrows[IllegalArgumentException] {
      Sampling.negativePairs(bad, "neg_id", 2, 4)
    }
  }

  test("mixtureResample hits each group's target share in expectation") {
    val shares = Map("en" -> 0.2, "fr" -> 0.2, "de" -> 0.2, "es" -> 0.2,
      "zh" -> 0.2)
    val out = Sampling.mixtureResample(docs, "lang", "doc_id", shares)
    val n = docs.count().toDouble
    val got = rows(out.groupBy(col("lang")).agg(count(lit(1)).as("n")))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every group's materialized count must land within a few md5
    // coin-flips of target_share * N (copies = floor(r)·n_g exactly,
    // plus ~Binomial(n_g, frac(r)) extras)
    shares.foreach { case (g, w) =>
      val want = w * n
      assert(math.abs(got(g) - want) < want * 0.35,
        s"group $g: got ${got(g)}, want ~$want")
    }
    // minority groups really repeat: some row has epoch >= 1
    assert(rows(out.filter(col("epoch") >= 1).limit(1)).nonEmpty)
  }

  test("mixtureResample numbers epochs densely and is partitioning-invariant") {
    val shares = Map("en" -> 0.5, "fr" -> 0.5)
    def run(df: org.apache.spark.sql.DataFrame) =
      rows(Sampling.mixtureResample(df, "lang", "doc_id", shares)
        .select(col("doc_id"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch")))
        .map(r => (r.getLong(0), r.getLong(1)))
    val base = run(docs)
    assert(run(docs.repartition(13)) === base)
    // per doc: epochs are exactly 0..k-1
    base.groupBy(_._1).foreach { case (_, copies) =>
      assert(copies.map(_._2).sorted === (0L until copies.size.toLong))
    }
    // groups absent from the mix are dropped entirely
    val langs = base.map(_._1).toSet
    val inMix = rows(docs.filter(col("lang").isin("en", "fr"))
      .select(col("doc_id"))).map(_.getLong(0)).toSet
    assert(langs.subsetOf(inMix))
  }

  test("shardedShuffle: dense per-shard positions, bijective global order, partitioning-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      rows(Sampling.shardedShuffle(df, "doc_id", 8)
        .select(col("doc_id"), col("shard"), col("pos"), col("global_pos"))
        .orderBy(col("doc_id")))
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = run(docs)
    // deterministic: invariant to input partitioning
    assert(run(docs.repartition(13)) === base)
    // every shard's positions are exactly 0..n_s-1
    base.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted === (0L until rs.size.toLong))
    }
    // the interleave is consistent and injective (a permutation of a
    // subset of [0, N·maxPos))
    assert(base.forall(t => t._4 === t._3 * 8 + t._2))
    assert(base.map(_._4).distinct.size === base.size)
    // within-shard order is shuffled, not ingest order: some shard's
    // doc ids are not ascending in pos
    val monotone = base.groupBy(_._2).values.forall { rs =>
      val byPos = rs.sortBy(_._3).map(_._1)
      byPos === byPos.sorted
    }
    assert(!monotone)
    // growth stability of the SHARD assignment (order ranks shift, the
    // md5 draws do not): a subset corpus assigns shared rows to the
    // same shard
    val subset = run(docs.filter(col("doc_id") < 100)).map(t => t._1 -> t._2).toMap
    assert(base.filter(_._1 < 100).forall { case (id, sh, _, _) => subset(id) == sh })
    // NULL keys are dropped, not emitted
    import spark.implicits._
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("doc_id")
    assert(rows(Sampling.shardedShuffle(withNull, "doc_id", 4)).size === 2)
  }

  test("leakageFreeSplit never strands near-dup pairs across the split") {
    import spark.implicits._
    // planted clusters: (1,2,3) and (10,11) near-dups, 20/21 singles
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val d = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val out = rows(Sampling.leakageFreeSplit(d, "doc_id", pairs, 50)
      .select(col("doc_id"), col("split_key"), col("split")))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val split = out.map(t => t._1 -> t._3).toMap
    assert(split(1L) === split(2L) && split(2L) === split(3L))
    assert(split(10L) === split(11L))
    // cluster members share the canonical (min) id as split key
    val key = out.map(t => t._1 -> t._2).toMap
    assert(Seq(1L, 2L, 3L).forall(key(_) === 1L))
    assert(Seq(10L, 11L).forall(key(_) === 10L))
    // singletons split exactly as hashSplit on their own id would
    val solo = rows(Sampling.hashSplit(
      Seq(20L, 21L).toDF("doc_id"), "doc_id", 50)
      .select(col("doc_id"), col("split")))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split(20L) === solo(20L) && split(21L) === solo(21L))
  }

  test("farthestPointSample greedily picks the least-covered vector each round") {
    import spark.implicits._
    // Three tight clusters along axes + the lowest-id seed in cluster X:
    // greedy must visit each OTHER cluster before returning to X.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),  // seed (cluster X)
      (1L, Array(0.9f, 0.1f, 0f, 0f)), // near seed
      (2L, Array(0f, 1f, 0f, 0f)),  // cluster Y
      (3L, Array(0f, 0f, 1f, 0f)),  // cluster Z
      (4L, Array(0f, 0.95f, 0.05f, 0f)) // near Y
    ).toDF("id", "vec").repartition(3)
    val picks = rows(graft.operators.Sampling
      .farthestPointSample(vecs, "id", "vec", k = 3)
      .orderBy(col("sel_rank"))).map(r => (r.getInt(0), r.getLong(1)))
    assert(picks.head === ((0, 0L))) // rank 0 = lowest id
    // next two picks are the two orthogonal clusters (order by coverage,
    // both orthogonal to the seed -> tie broken by id: 2 then 3).
    assert(picks.map(_._2) === Seq(0L, 2L, 3L))
  }

  test("farthestPointSample: degenerate vectors are excluded, never selected first") {
    import spark.implicits._
    // guardCos pins zero-norm/NULL-element rows to cover = -2, and the
    // ASCENDING argmin read -2 as "least covered" — corrupt rows were
    // picked before any real row, and a degenerate SEED (lowest id)
    // collapsed the whole sample to the k lowest ids
    val base = Seq(
      (3L, Array(1f, 0f, 0f)), (4L, Array(0f, 1f, 0f)),
      (5L, Array(0f, 0f, 1f))).toDF("id", "vec")
    val corrupt = spark.sql(
      """SELECT * FROM VALUES
        | (0L, array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))),
        | (1L, array(CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))),
        | (2L, CAST(NULL AS ARRAY<FLOAT>))
        |AS t(id, vec)""".stripMargin)
    val picks = rows(graft.operators.Sampling
      .farthestPointSample(base.unionByName(corrupt), "id", "vec", k = 3)
      .orderBy(col("sel_rank"))).map(_.getLong(1))
    assert(picks === Seq(3L, 4L, 5L),
      "only measurable vectors may seed or be selected")
  }

  test("temporalHoldout: NULL-timestamp events join neither split (no future-in-train)") {
    import spark.implicits._
    // desc ordering sorted NULLs LAST: untimed events ranked as the
    // key's OLDEST and landed in train — if they actually happened
    // after the holdout events, training contained the eval's future
    val ev = Seq(
      ("k", Some(3L), 1L), ("k", Some(2L), 2L), ("k", Some(1L), 3L),
      ("k", None: Option[Long], 4L)).toDF("key", "ts", "tb")
    val out = rows(graft.operators.Sampling
      .temporalHoldout(ev, "key", "ts", "tb", holdoutLast = 1))
      .map(r => (r.getLong(2), r.getString(4)))
    assert(out.size === 3, "the untimed event is excluded, not ranked oldest")
    assert(out.toMap === Map(1L -> "holdout", 2L -> "train", 3L -> "train"))
  }

  test("farthestPointSample: k=1 returns just the seed; k > corpus fails fast") {
    import spark.implicits._
    val vecs = Seq((7L, Array(1f, 0f)), (9L, Array(0f, 1f))).toDF("id", "vec")
    val one = rows(graft.operators.Sampling
      .farthestPointSample(vecs, "id", "vec", 1)).map(_.getLong(1))
    assert(one === Seq(7L))
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.farthestPointSample(vecs, "id", "vec", 5)
    }
  }

  test("farthestPointSampleBatched: batch=1 is bit-equal to the exact greedy") {
    import spark.implicits._
    val vecs = (0L until 12L).map { i =>
      (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat / 11f))
    }.toDF("id", "vec").repartition(3)
    val exact = rows(graft.operators.Sampling
      .farthestPointSample(vecs, "id", "vec", k = 6)
      .orderBy(col("sel_rank")))
    val batched = rows(graft.operators.Sampling
      .farthestPointSampleBatched(vecs, "id", "vec", k = 6, batch = 1)
      .orderBy(col("sel_rank")))
    assert(batched === exact)
  }

  test("farthestPointSampleBatched: large k completes in bounded rounds") {
    import graft.operators.Sampling
    // the job-count contract is arithmetic: k=256 at batch=8 = 33
    // driver round-trips (seed + 32 batch argmins), within the <= 40
    // bound the literal-plan rationale demands
    assert(Sampling.batchedRounds(256, 8) === 33)
    assert(Sampling.batchedRounds(2, 8) === 2)
    import spark.implicits._
    val vecs = (0L until 90L).map { i =>
      (i, Array.tabulate(4)(d => ((i * 13 + d * 5) % 17).toFloat / 17f))
    }.toDF("id", "vec").repartition(4)
    val picks = rows(Sampling
      .farthestPointSampleBatched(vecs, "id", "vec", k = 70, batch = 16)
      .orderBy(col("sel_rank"))).map(r => (r.getInt(0), r.getLong(1)))
    assert(picks.size === 70)
    assert(picks.map(_._2).distinct.size === 70) // no repeats
    assert(picks.head === ((0, 0L))) // rank 0 = lowest id
    // round 1's first pick sees only the seed's cover — it must equal
    // the exact greedy's second pick
    val exact2 = rows(Sampling.farthestPointSample(vecs, "id", "vec", 2)
      .orderBy(col("sel_rank"))).map(_.getLong(1))
    assert(picks(1)._2 === exact2(1))
    // old single-pick cap rejects k=70; the batched path is the escape
    intercept[IllegalArgumentException] {
      Sampling.farthestPointSample(vecs, "id", "vec", 70)
    }
  }

  test("weightedReservoir: exact k, dominant weights win, non-positive never selected") {
    import spark.implicits._
    // one row with overwhelming weight + tiny-weight rows + junk weights
    val df = (Seq((1L, 1e9)) ++ (2L to 40L).map(i => (i, 1e-6)) ++
      Seq((100L, 0.0), (101L, -5.0))).toDF("id", "w")
    val out = rows(Sampling.weightedReservoir(df, "id", col("w"), 5))
    assert(out.size === 5)
    val ids = out.map(_.getLong(0)).toSet
    // ln(u)/w -> 0- as w -> inf: the dominant row always wins
    assert(ids.contains(1L))
    assert(!ids.contains(100L) && !ids.contains(101L),
      "non-positive weights must never be selected over positive ones")
    // deterministic: identical call returns the identical sample
    assert(rows(Sampling.weightedReservoir(df, "id", col("w"), 5))
      .map(_.getLong(0)) === out.map(_.getLong(0)))
  }

  test("NaN weights never win: reservoirs, per-group, and Bernoulli keep") {
    import spark.implicits._
    // NaN compares LARGER than every double in Spark — an unguarded
    // weight > 0.0 test admits NaN and ln(u)/NaN desc-sorts FIRST,
    // so 0.0/0.0 quality scores would fill the whole sample
    val df = (Seq((1L, 1e9)) ++ (2L to 10L).map(i => (i, 0.5)) ++
      (90L to 99L).map(i => (i, Double.NaN))).toDF("id", "w")
    val ids = rows(Sampling.weightedReservoir(df, "id", col("w"), 5))
      .map(_.getLong(0)).toSet
    assert(ids.contains(1L) && ids.forall(_ < 90L),
      s"NaN-weight rows entered the reservoir: $ids")
    val grouped = df.withColumn("g", (col("id") % 2).cast("int"))
    val gids = rows(Sampling.weightedReservoirPerGroup(
      grouped, "g", "id", col("w"), 3)).map(_.getLong(0)).toSet
    assert(gids.forall(_ < 90L),
      s"NaN-weight rows entered a group reservoir: $gids")
    val kept = rows(Sampling.sampleByWeight(df, "id", col("w")))
      .map(_.getLong(0)).toSet
    assert(kept.forall(_ < 90L), s"NaN-weight rows were kept: $kept")
  }

  test("weightedReservoir plans as TakeOrderedAndProject, no global sort") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, i.toDouble)).toDF("id", "w")
    val p = planString(Sampling.weightedReservoir(df, "id", col("w"), 3))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("weightedReservoirPerGroup: exactly k per group, dominant weight wins its group") {
    import spark.implicits._
    val df = (Seq(("a", 1L, 1e9), ("b", 100L, 1e9)) ++
      (2L to 20L).map(i => ("a", i, 1e-6)) ++
      (102L to 120L).map(i => ("b", i, 1e-6))).toDF("g", "id", "w")
    val out = rows(Sampling.weightedReservoirPerGroup(df, "g", "id", col("w"), 2)
      .orderBy(col("g"), col("es_rank")))
    assert(out.size === 4)
    assert(out.count(_.getString(0) == "a") === 2)
    // the dominant row ranks first within its own group
    assert(out.filter(_.getInt(4) == 1).map(_.getLong(1)).toSet === Set(1L, 100L))
  }

  test("weightedReservoir(PerGroup): a group with fewer than k valid rows emits ONLY them") {
    import spark.implicits._
    // group a: 2 valid rows + 3 zero-weight + 1 NULL-key — the contract
    // says non-positive/NULL/NaN weights NEVER win, so k=4 must return 2
    val df = (Seq(("a", Some(1L), 2.0), ("a", Some(2L), 3.0),
      ("a", Some(3L), 0.0), ("a", Some(4L), 0.0), ("a", Some(5L), 0.0),
      ("a", None: Option[Long], 9.0),
      ("b", Some(10L), 1.0))).toDF("g", "id", "w")
    val grp = rows(Sampling.weightedReservoirPerGroup(df, "g", "id", col("w"), 4))
    assert(grp.count(_.getString(0) == "a") === 2)
    assert(grp.filter(_.getString(0) == "a").map(_.getLong(1)).toSet === Set(1L, 2L))
    val glob = rows(Sampling.weightedReservoir(
      df.filter(col("g") === "a"), "id", col("w"), 4))
    assert(glob.map(_.getLong(1)).toSet === Set(1L, 2L))
  }

  test("selectByBudget: one NaN size cannot poison the cumulative tail") {
    import spark.implicits._
    val df = Seq(
      (1L, 9.0, Some(100.0)), (2L, 8.0, Some(Double.NaN)),
      (3L, 7.0, Some(100.0)), (4L, 6.0, Some(100.0)),
      (5L, 5.0, None: Option[Double])
    ).toDF("id", "score", "n")
    // the NaN-size row used to turn cum_before into NaN for every row
    // after it (NaN < budget is false), silently dropping the tail
    val kept = rows(Sampling.selectByBudget(df, "id", "score", "n", 1000L)
      .orderBy(col("id"))).map(_.getLong(0))
    assert(kept === Seq(1L, 3L, 4L))
  }

  test("kFolds: NULL keys land in exactly one (shared, deterministic) fold") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("b"), None, None).toDF("k")
    val folds = rows(Sampling.kFolds(df, "k", 5))
    assert(folds.forall(!_.isNullAt(1)), "no row may get a NULL fold")
    val nullFolds = folds.filter(_.isNullAt(0)).map(_.getLong(1)).distinct
    assert(nullFolds.size === 1, "all NULL keys share one fold")
    assert(nullFolds.head === 0L,
      "keyless rows land in fold 0 (shared with ~1/k of hashed keys)")
  }

  test("kFolds: no in-domain sentinel — a crafted key cannot co-fold with NULLs") {
    import spark.implicits._
    // Under the old sentinel-string design, a genuine key equal to the
    // sentinel hashed identically to NULL keys and silently co-folded
    // with them. The branch design assigns real keys by hash only, so
    // a crafted key agrees with the hash rule, not the NULL rule.
    val crafted = "\u0000__null_key"
    val df = Seq(Option(crafted), None).toDF("k")
    val folds = rows(Sampling.kFolds(df, "k", 5))
    val craftedFold = folds.find(!_.isNullAt(0)).get.getLong(1)
    val hashFold = rows(
      Seq(crafted).toDF("k").select(
        org.apache.spark.sql.functions.pmod(
          graft.functions.Text.md5Long63(col("k").cast("string")),
          org.apache.spark.sql.functions.lit(5L)))).head.getLong(0)
    assert(craftedFold === hashFold,
      "a real key must fold by hash, never by the NULL rule")
  }

  test("farthestPointSample: NULL ids/vectors are excluded, not crashed on") {
    import spark.implicits._
    val df = Seq(
      (Some(7L), Some(Array(1f, 0f))), (Some(8L), Some(Array(0f, 1f))),
      (None: Option[Long], Some(Array(9f, 9f))),
      (Some(9L), None: Option[Array[Float]])
    ).toDF("id", "vec")
    // NULL ids sort first ascending: the old seed pick NPE'd on getLong
    val out = rows(Sampling.farthestPointSample(df, "id", "vec", 2))
    assert(out.map(_.getLong(1)).toSet === Set(7L, 8L))
  }

  test("mixtureResample: NULL-key rows don't distort the realized mix") {
    import spark.implicits._
    // group a: 40 rows but half NULL-keyed; group b: 20 valid rows.
    // Counting the NULL-keyed rows (old behavior) halves a's realized
    // share; counting eligible rows keeps the requested 50/50 mix.
    val df = ((1L to 20L).map(i => ("a", Some(i))) ++
      (1 to 20).map(_ => ("a", None: Option[Long])) ++
      (21L to 40L).map(i => ("b", Some(i)))).toDF("g", "id")
    val out = rows(Sampling.mixtureResample(df, "g", "id",
      Map("a" -> 0.5, "b" -> 0.5)))
    val byG = out.groupBy(_.getString(0)).view.mapValues(_.size).toMap
    // equal eligible counts + equal shares => r = 1.0 exactly for both
    assert(byG("a") === 20 && byG("b") === 20, s"realized mix: $byG")
  }

  test("selectByBudget: greedy by score, boundary doc kept, overshoot bounded by one doc") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.9, 40L), (2L, 0.8, 40L), (3L, 0.7, 40L), (4L, 0.6, 40L)
    ).toDF("id", "score", "n")
    // budget 100: doc1 (cum 0), doc2 (cum 40), doc3 (cum 80 < 100 — kept,
    // overshoots to 120), doc4 (cum 120 — dropped)
    val out = rows(Sampling.selectByBudget(df, "id", "score", "n", 100L)
      .orderBy(col("id"))).map(r => (r.getLong(0), r.getLong(3)))
    assert(out === Seq((1L, 0L), (2L, 40L), (3L, 80L)))
  }
  test("stratifiedSample keeps ceil(n/den) per stratum, repartition-stable") {
    import spark.implicits._
    val df = ((1 to 13).map(i => (i.toLong, "a"))
      ++ (14 to 16).map(i => (i.toLong, "b"))
      ++ Seq((17L, "c"))).toDF("id", "g")
    val out = rows(Sampling.stratifiedSample(df, "g", "id", num = 1, den = 5)
      .orderBy(col("g"), col("sample_rank")))
      .map(r => (r.getString(1), r.getLong(0)))
    val perStratum = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perStratum === Map("a" -> 3, "b" -> 1, "c" -> 1)) // ceil(13/5), ceil(3/5), ceil(1/5)
    val again = rows(
      Sampling.stratifiedSample(df.repartition(7), "g", "id", num = 1, den = 5)
        .orderBy(col("g"), col("sample_rank")))
      .map(r => (r.getString(1), r.getLong(0)))
    assert(again === out) // identical survivors under any layout
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(df, "g", "id", num = 6, den = 5)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(df.withColumn("stratum_n", lit(1)),
        "g", "id", num = 1, den = 5)
    }
  }
  test("stratifiedSample property: every stratum keeps exactly ceil(n*num/den)") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 4) {
      val strata = (0 until 5).map(g => g.toString -> (1 + rnd.nextInt(23)))
      val df = strata.flatMap { case (g, n) =>
        (1 to n).map(i => (s"$g-$i", g)) }.toDF("id", "g")
      val num = 1 + rnd.nextInt(3); val den = num + 1 + rnd.nextInt(4)
      val kept = rows(Sampling.stratifiedSample(df, "g", "id", num, den))
        .groupBy(_.getString(1)).view.mapValues(_.size).toMap
      strata.foreach { case (g, n) =>
        val want = (n * num + den - 1) / den
        assert(kept.getOrElse(g, 0) === want,
          s"trial $trial stratum $g n=$n frac=$num/$den")
      }
    }
  }
  test("kFolds: permanent assignment, all folds hit, complement = other folds") {
    import spark.implicits._
    val df = (1L to 200L).toDF("id")
    val folds = rows(Sampling.kFolds(df, "id", 5))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(folds.map(_._2).toSet === Set(0L, 1L, 2L, 3L, 4L))
    val again = rows(Sampling.kFolds(df.repartition(9), "id", 5))
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    folds.foreach { case (id, f) => assert(again(id) === f) }
    // every row is in exactly one fold
    assert(folds.size === 200)
  }

  test("temporalHoldout: last-k per key, short keys land fully in holdout") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "2024-01-01"), (1L, 2L, "2024-01-02"), (1L, 3L, "2024-01-03"),
      (2L, 4L, "2024-01-01")
    ).toDF("user_id", "event_id", "d")
      .withColumn("ts", col("d").cast("timestamp"))
    val out = rows(Sampling.temporalHoldout(df, "user_id", "ts", "event_id", 2)
      .orderBy(col("user_id"), col("recency_rank")))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(5)))
    assert(out === Seq(
      (1L, 3L, "holdout"), (1L, 2L, "holdout"), (1L, 1L, "train"),
      (2L, 4L, "holdout"))) // a 1-event user has no train slice
  }
}
