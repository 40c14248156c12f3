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

  // Small score/id domains force heavy ties. NaN and the infinities are
  // in-domain: cosine of a zero-norm vector is 0/0 = NaN, and the
  // aggregator must rank it where ORDER BY score DESC does (greatest,
  // i.e. first) — the window form it replaced and the DuckDB oracle
  // both do.
  private val scored: Gen[ScoredNeighbor] = for {
    id <- Gen.chooseNum(0L, 40L)
    score <- Gen.oneOf(
      Gen.chooseNum(-1.0, 1.0),
      Gen.oneOf(-1.0, -0.5, 0.0, 0.5, 1.0,
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
  } yield ScoredNeighbor(id, score)

  private val inputs: Gen[List[ScoredNeighbor]] = Gen.listOf(scored)
  private val ks: Gen[Int] = Gen.chooseNum(1, 12)

  /** Reference semantics: score desc with NaN greatest (Spark/DuckDB
    * DESC order), ties on ascending id.
    */
  private val refOrd: Ordering[ScoredNeighbor] = (a, b) => {
    val c = java.lang.Double.compare(b.score, a.score)
    if (c != 0) c else java.lang.Long.compare(a.id, b.id)
  }
  private def reference(xs: List[ScoredNeighbor], k: Int): List[ScoredNeighbor] =
    xs.sorted(refOrd).take(k)

  /** Case-class `==` on a primitive Double field is IEEE `==`, which is
    * false for NaN == NaN — compare canonical bits instead so two
    * NaN-scored rows with the same id are equal.
    */
  private def bits(xs: Seq[ScoredNeighbor]): Seq[(Long, Long)] =
    xs.map(s => (s.id, java.lang.Double.doubleToLongBits(s.score)))

  private def reduceAll(agg: TopKAggregator, xs: List[ScoredNeighbor]) =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("reduce-fold equals sorted take(k)") =
    forAll(inputs, ks) { (xs, k) =>
      val agg = new TopKAggregator(k)
      bits(reduceAll(agg, xs).toList) == bits(reference(xs, k))
    }

  property("merge of any split equals whole — partial aggregation is lossless") =
    forAll(inputs, ks, Gen.chooseNum(0, 100)) { (xs, k, cut) =>
      val agg = new TopKAggregator(k)
      val at = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (a, b) = xs.splitAt(at)
      bits(agg.merge(reduceAll(agg, a), reduceAll(agg, b)).toList) ==
        bits(reference(xs, k))
    }

  property("merge is commutative") =
    forAll(inputs, inputs, ks) { (xs, ys, k) =>
      val agg = new TopKAggregator(k)
      val (ba, bb) = (reduceAll(agg, xs), reduceAll(agg, ys))
      bits(agg.merge(ba, bb).toList) == bits(agg.merge(bb, ba).toList)
    }

  property("merge is associative across three partitions") =
    forAll(inputs, inputs, inputs, ks) { (xs, ys, zs, k) =>
      val agg = new TopKAggregator(k)
      val (ba, bb, bc) = (reduceAll(agg, xs), reduceAll(agg, ys), reduceAll(agg, zs))
      bits(agg.merge(agg.merge(ba, bb), bc).toList) ==
        bits(agg.merge(ba, agg.merge(bb, bc)).toList)
    }

  property("buffer never exceeds k") =
    forAll(inputs, ks) { (xs, k) =>
      val agg = new TopKAggregator(k)
      val whole = reduceAll(agg, xs)
      Prop(whole.length <= k) && Prop(
        xs.grouped(3).map(g => reduceAll(agg, g.toList))
          .foldLeft(agg.zero)(agg.merge).length <= k)
    }

  property("NaN scores rank first, exactly k survive") =
    forAll(Gen.chooseNum(1L, 5L), ks) { (nNan, k) =>
      val agg = new TopKAggregator(k)
      val xs = (0L until nNan).map(i => ScoredNeighbor(100 + i, Double.NaN)).toList ++
        List(ScoredNeighbor(1, 1.0), ScoredNeighbor(2, 0.0), ScoredNeighbor(3, -1.0))
      val got = reduceAll(agg, xs).toList
      Prop(bits(got) == bits(reference(xs, k))) &&
        Prop(got.take(math.min(nNan, k).toInt).forall(_.score.isNaN))
    }
}
