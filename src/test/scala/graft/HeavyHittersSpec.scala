package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // 3 hot keys at 300 rows each over a 200-key cold tail at 3 rows each:
  // hot share = 300/1500 = 20%, cold share = 0.2%.
  private lazy val skewed = (
    (1 to 3).flatMap(h => Seq.fill(300)(s"hot$h")) ++
      (1 to 200).flatMap(c => Seq.fill(3)(s"cold$c"))
  ).toDF("k").repartition(8) // several partitions so merge() really runs

  test("recovers exactly the true heavy set with exact counts and shares") {
    val hh = HeavyHitters.heavyHitters(skewed, "k", minShare = 0.1)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(hh.map(_._1).toSeq === Seq("hot1", "hot2", "hot3"))
    assert(hh.forall(_._2 === 300L))
    assert(hh.forall(_._3 === 0.2))
  }

  test("candidate pass is bounded and misses no key above the guarantee threshold") {
    // k = 20 counters over 203 distinct keys: evictions fire constantly,
    // yet every key with share > 1/(k+1) must survive the merged summary.
    val k = 20
    val cand = HeavyHitters.candidates(skewed, "k", k)
      .select("key").as[String].collect().toSet
    assert(cand.size <= k)
    val n = skewed.count()
    val exact = skewed.groupBy("k").count().as[(String, Long)].collect()
    val mustKeep = exact.filter(_._2 > n / (k + 1).toDouble).map(_._1)
    assert(mustKeep.nonEmpty && mustKeep.forall(cand.contains))
  }

  test("verify pass kills false candidates: none of the cold tail survives") {
    // slack=8 tracks far more candidates than true heavies; the exact
    // re-count must still emit only the true heavy set.
    val hh = HeavyHitters.heavyHitters(skewed, "k", minShare = 0.1, slack = 8.0)
      .select("key").as[String].collect().toSet
    assert(hh === Set("hot1", "hot2", "hot3"))
  }

  test("uniform input with no key above threshold yields an empty result") {
    val uniform = (1 to 100).flatMap(i => Seq.fill(5)(s"u$i")).toDF("k")
    assert(HeavyHitters.heavyHitters(uniform, "k", minShare = 0.05).count() === 0L)
  }

  test("null keys are excluded from counts, candidates, and the total") {
    val withNulls = skewed.union(
      spark.range(500).select(lit(null).cast("string").as("k")))
    val hh = HeavyHitters.heavyHitters(withNulls, "k", minShare = 0.1)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    // total must be 1500 (nulls dropped), so hot shares stay 0.2.
    assert(hh.map(_._1).toSeq === Seq("hot1", "hot2", "hot3"))
    assert(hh.forall(_._3 === 0.2))
  }

  test("per-group: each group's heavies are judged against ITS OWN total") {
    // group A: 'x' at 50% (heavy); group B: same key 'x' at 4% (not).
    val df = (
      Seq.fill(50)(("A", "x")) ++ (1 to 50).map(i => ("A", s"a$i")) ++
        Seq.fill(4)(("B", "x")) ++ (1 to 96).map(i => ("B", s"b$i"))
    ).toDF("g", "k").repartition(6)
    val hh = rows(HeavyHitters.heavyHittersPerGroup(df, "g", "k", minShare = 0.2)
      .orderBy(col("g"), col("key")))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(hh === Seq(("A", "x", 50L, 0.5)))
  }

  test("superset guarantee holds across randomized zipf corpora and partitionings") {
    for (seed <- 1 to 3; parts <- Seq(1, 7)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(2000)(s"z${math.min(50, (1 / math.max(1e-9, rnd.nextDouble())).toInt)}")
      val df = rows.toDF("k").repartition(parts)
      val k = 15
      val cand = HeavyHitters.candidates(df, "k", k)
        .select("key").as[String].collect().toSet
      val exact = df.groupBy("k").count().as[(String, Long)].collect()
      val heavy = exact.filter(_._2 > rows.size / (k + 1).toDouble).map(_._1)
      assert(heavy.forall(cand.contains),
        s"seed=$seed parts=$parts lost ${heavy.filterNot(cand.contains).mkString(",")}")
    }
  }
}
