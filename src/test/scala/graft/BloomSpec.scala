package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.Bloom

class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private val M = 1024 // bits; small so collisions actually occur
  private val K = 5

  /** Driver-side replay of the operator's md5 arithmetic. */
  private def refPosition(key: String, i: Int, mBits: Int): Int = {
    val d = MessageDigest.getInstance("MD5").digest(s"$key:$i".getBytes("UTF-8"))
    val top = d.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    ((top & Long.MaxValue) % mBits).toInt
  }

  private def refBits(keys: Seq[String]): Array[Long] = {
    val bits = new Array[Long](M / 64)
    for (k <- keys; i <- 0 until K) {
      val p = refPosition(k, i, M)
      bits(p / 64) |= (1L << (p % 64))
    }
    bits
  }

  test("buildBits equals a driver-side replay of the same md5 recipe") {
    val keys = (0 until 200).map(i => s"key$i")
    val dim = keys.toDF("k")
    val built = Bloom.buildBits(dim, "k", M, K)
    assert(built.toSeq === refBits(keys).toSeq)
  }

  test("duplicate and null dim keys do not change the filter") {
    val keys = (0 until 50).map(i => s"key$i")
    val dim = (keys ++ keys ++ keys).toDF("k")
      .union(Seq.empty[String].toDF("k"))
      .union(spark.sql("SELECT CAST(NULL AS STRING) AS k"))
    assert(Bloom.buildBits(dim, "k", M, K).toSeq === refBits(keys).toSeq)
  }

  test("mightContain: zero false negatives; selective filter really prunes") {
    val present = (0 until 300).map(i => i * 7L)
    val bits = Bloom.buildBits(present.toDF("k"), "k", 1 << 14, K)
    val probe = (0L until 10000L).toDF("k")
    val kept = probe.filter(Bloom.mightContain(col("k"), bits, K))
      .as[Long].collect().toSet
    // every built key survives
    present.foreach(p => assert(kept.contains(p), s"false negative for $p"))
    // and the filter prunes hard (at 14 bits/key the fp rate is ~1e-3;
    // allow a generous margin)
    assert(kept.size < present.count(_ < 10000) + 200,
      s"bloom kept ${kept.size} of 10000 — not pruning")
  }

  test("prunedSemiJoin result equals the plain semi join; probe filter is pre-shuffle") {
    // spark.range (not a local Seq): ConvertToLocalRelation would fold
    // the bloom filter into a LocalTableScan and hide it from the plan
    val fact = spark.range(5000).select((col("id") % 500).as("fk"), col("id").as("payload"))
    val dim = (0L until 500L).filter(_ % 17 == 0).toDF("dk")
    val viaBloom = Bloom.prunedSemiJoin(fact, "fk", dim, "dk", mBits = 1 << 12, k = K)
      .orderBy("payload").collect().toSeq
    val exact = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .orderBy("payload").collect().toSeq
    assert(viaBloom === exact)

    val plan = planString(Bloom.prunedSemiJoin(fact, "fk", dim, "dk", mBits = 1 << 12, k = K))
    // the bloom membership tests sit in a Filter on the fact scan side
    assert(plan.contains("md5_long64"), s"expected md5 bit tests in plan:\n$plan")
  }

  test("negative-zero double keys match positive zero, both directions") {
    // -0.0 and 0.0 compare equal in the verify join but render
    // differently as strings; unnormalized, the bloom would hash the
    // renderings apart and silently DROP the row — a false negative,
    // the one failure the contract forbids
    val factNeg = spark.sql(
      "SELECT * FROM VALUES (CAST(-0.0 AS DOUBLE), 'neg'), (1.5D, 'x') AS t(fk, payload)")
    val dimPos = spark.sql("SELECT * FROM VALUES (CAST(0.0 AS DOUBLE)), (1.5D) AS t(dk)")
    val out1 = Bloom.prunedSemiJoin(factNeg, "fk", dimPos, "dk", mBits = 1024, k = K)
      .select("payload").as[String].collect().toSet
    assert(out1 === Set("neg", "x"), "-0.0 fact key must match 0.0 dim key")
    // and the mirror: 0.0 fact against a -0.0 dim
    val factPos = spark.sql("SELECT * FROM VALUES (CAST(0.0 AS DOUBLE), 'pos') AS t(fk, payload)")
    val dimNeg = spark.sql("SELECT * FROM VALUES (CAST(-0.0 AS DOUBLE)) AS t(dk)")
    val out2 = Bloom.prunedSemiJoin(factPos, "fk", dimNeg, "dk", mBits = 1024, k = K)
      .select("payload").as[String].collect().toSet
    assert(out2 === Set("pos"), "0.0 fact key must match -0.0 dim key")
  }

  test("null fact keys are dropped, matching semi join semantics") {
    val fact = spark.sql(
      "SELECT * FROM VALUES (1L, 'a'), (CAST(NULL AS LONG), 'b'), (2L, 'c') AS t(fk, payload)")
    val dim = Seq(1L, 2L).toDF("dk")
    val out = Bloom.prunedSemiJoin(fact, "fk", dim, "dk", mBits = 1024, k = K)
      .select("payload").as[String].collect().toSet
    assert(out === Set("a", "c"))
  }
}
