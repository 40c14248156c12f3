package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.MisraGriesAggregator

/** Property coverage for the Misra-Gries summary — the merge path is
  * what partial aggregation exercises at scale (every task reduces its
  * partition to a <= k-entry map the reducer merges), so the
  * frequent-item guarantee must hold for ANY split of the input into
  * partitions, not just the sequential-reduce path.
  */
object HeavyHittersPropertiesSpec extends Properties("MisraGries") {

  // Zipf-flavored alphabet: low ids are overwhelmingly more likely, so
  // genuine heavy hitters exist next to a long tail and eviction fires.
  private val key: Gen[String] = Gen.frequency(
    (8, Gen.oneOf("h0", "h1")),
    (4, Gen.oneOf("m0", "m1", "m2")),
    (3, Gen.chooseNum(0, 200).map(i => s"t$i")))

  private val inputs: Gen[List[String]] = Gen.listOf(key)
  private val ks: Gen[Int] = Gen.chooseNum(1, 25)
  // Split points to cut the input into "partitions" for the merge path.
  private val layouts: Gen[Int] = Gen.chooseNum(1, 7)

  private def summarize(xs: List[String], k: Int, parts: Int): Map[String, Long] = {
    val agg = new MisraGriesAggregator(k)
    val chunks =
      if (xs.isEmpty) List(Nil)
      else xs.grouped(math.max(1, xs.size / parts)).toList
    chunks
      .map(c => c.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      .reduce((a, b) => agg.merge(a, b))
      .toMap
  }

  property("every key above n/(k+1) survives any partitioning (no false negatives)") =
    forAll(inputs, ks, layouts) { (xs, k, parts) =>
      val summary = summarize(xs, k, parts)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val threshold = xs.size.toDouble / (k + 1)
      exact.forall { case (kk, c) => c <= threshold || summary.contains(kk) }
    }

  property("summary size is bounded by k") =
    forAll(inputs, ks, layouts) { (xs, k, parts) =>
      summarize(xs, k, parts).size <= k
    }

  property("counts are lower bounds with undercount <= n/(k+1)") =
    forAll(inputs, ks, layouts) { (xs, k, parts) =>
      val summary = summarize(xs, k, parts)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = xs.size.toDouble / (k + 1)
      summary.forall { case (kk, c) =>
        val e = exact.getOrElse(kk, 0L)
        c <= e && (e - c) <= bound + 1e-9
      }
    }

  property("merge order does not affect the guarantee (associativity of the bound)") =
    forAll(inputs, ks) { (xs, k) =>
      // Pathological layout: every element its own partition.
      val agg = new MisraGriesAggregator(k)
      val merged = xs
        .map(x => agg.reduce(agg.zero, x))
        .foldLeft(agg.zero)((a, b) => agg.merge(a, b))
        .toMap
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val threshold = xs.size.toDouble / (k + 1)
      exact.forall { case (kk, c) => c <= threshold || merged.contains(kk) }
    }
}
