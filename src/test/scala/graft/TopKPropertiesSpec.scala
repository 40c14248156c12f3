package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.{ScoredNeighbor, TopKAggregator}

/** Property coverage for the bounded-heap top-k aggregator — the merge
  * path is what partial aggregation exercises at scale (every task emits
  * a ≤k buffer that the reducer merges), so it must agree with the
  * sorted-reference semantics for ANY split of the input.
  */
object TopKPropertiesSpec extends Properties("TopKAggregator") {

  // Small score/id domains force heavy ties; finite doubles only (the
  // operator's contract — cosine of non-degenerate vectors).
  private val scored: Gen[ScoredNeighbor] = for {
    id <- Gen.chooseNum(0L, 40L)
    score <- Gen.oneOf(Gen.chooseNum(-1.0, 1.0), Gen.oneOf(-1.0, -0.5, 0.0, 0.5, 1.0))
  } yield ScoredNeighbor(id, score)

  private val inputs: Gen[List[ScoredNeighbor]] = Gen.listOf(scored)
  private val ks: Gen[Int] = Gen.chooseNum(1, 12)

  /** Reference semantics: full sort by (score desc, id asc), first k. */
  private def reference(xs: List[ScoredNeighbor], k: Int): List[ScoredNeighbor] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  private def reduceAll(agg: TopKAggregator, xs: List[ScoredNeighbor]) =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("reduce-fold equals sorted take(k)") =
    forAll(inputs, ks) { (xs, k) =>
      val agg = new TopKAggregator(k)
      reduceAll(agg, xs).toList == reference(xs, k)
    }

  property("merge of any split equals whole — partial aggregation is lossless") =
    forAll(inputs, ks, Gen.chooseNum(0, 100)) { (xs, k, cut) =>
      val agg = new TopKAggregator(k)
      val at = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (a, b) = xs.splitAt(at)
      agg.merge(reduceAll(agg, a), reduceAll(agg, b)).toList == reference(xs, k)
    }

  property("merge is commutative") =
    forAll(inputs, inputs, ks) { (xs, ys, k) =>
      val agg = new TopKAggregator(k)
      val (ba, bb) = (reduceAll(agg, xs), reduceAll(agg, ys))
      agg.merge(ba, bb).toList == agg.merge(bb, ba).toList
    }

  property("merge is associative across three partitions") =
    forAll(inputs, inputs, inputs, ks) { (xs, ys, zs, k) =>
      val agg = new TopKAggregator(k)
      val (ba, bb, bc) = (reduceAll(agg, xs), reduceAll(agg, ys), reduceAll(agg, zs))
      agg.merge(agg.merge(ba, bb), bc).toList == agg.merge(ba, agg.merge(bb, bc)).toList
    }

  property("buffer never exceeds k") =
    forAll(inputs, ks) { (xs, k) =>
      val agg = new TopKAggregator(k)
      val whole = reduceAll(agg, xs)
      Prop(whole.length <= k) && Prop(
        xs.grouped(3).map(g => reduceAll(agg, g.toList))
          .foldLeft(agg.zero)(agg.merge).length <= k)
    }
}
