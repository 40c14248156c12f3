package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Portable Bloom-filter join pruning.
  *
  * The 100 TB problem this solves: a semi join `fact ⋈ dim` where the
  * dim's key set is too large to broadcast exactly (tens of millions of
  * keys), so Spark falls back to shuffling the ENTIRE fact table — the
  * dominant cost when the join is selective. A Bloom filter of the dim
  * keys is thousands of times smaller than the key set (m bits for
  * ~0.01 false-positive rate at m/n ≈ 10 bits/key), broadcasts
  * trivially, and lets a map-side filter drop the overwhelming majority
  * of fact rows BEFORE the shuffle; the exact join then runs over the
  * pruned remainder and removes the false positives. Spark's own
  * runtime filter (`InjectRuntimeFilter`, asserted in `PlanShapeSpec`)
  * applies the same idea opportunistically inside one query; this
  * operator makes it an explicit, persistable artifact — the bloom is a
  * plain `Array[Long]` that can be built once and reused across many
  * queries/jobs against the same dim snapshot, which the runtime filter
  * cannot.
  *
  * Portability: bit position `i` for a key is
  * `md5_63(key || ':' || i) mod m` ([[Text.md5Long63]]), so any engine
  * with md5 derives the identical filter — the same recipe that made
  * SimHash/sign-LSH fully oracle-checkable. `BloomSpec` rebuilds the
  * filter driver-side from the same arithmetic and asserts bit
  * equality; the registered query's DuckDB oracle is the plain exact
  * semi join, which the bloom-pruned plan must reproduce exactly
  * (pruning is transparent: zero false negatives by construction, false
  * positives die in the verify join).
  *
  * Scale shape: the build is one partial-combined `bit_or` aggregate
  * over k rows per distinct key — word masks merge associatively, so
  * map-side combine applies and at most `ceil(m/64)` rows reach the
  * driver (m = 2^24 → 256 KiB of longs; a bounded broadcast-model
  * collect, the IVF-codebook idiom). The probe is a pure codegen'd
  * map-side filter: k unrolled bit tests against the literal word
  * array, no shuffle, no state.
  */
object Bloom {

  /** Bit position of hash function `i` for `key`, in [0, mBits). */
  private def position(key: Column, i: Int, mBits: Int): Column =
    pmod(Text.md5Long63(concat(key.cast("string"), lit(":" + i))), lit(mBits.toLong))

  /** Collapse IEEE negative zero onto positive zero BEFORE hashing:
    * -0.0 and 0.0 compare EQUAL in joins (so the verify semi join
    * matches them) but render DIFFERENTLY as strings ("-0.0" vs
    * "0.0"), and the bloom hashes the rendering — an unnormalized
    * -0.0 on either side misses the other side's bits and silently
    * drops a row the plain semi join returns: a false NEGATIVE, the
    * one failure the operator contract forbids. The zero literal is
    * SAME-TYPE (a double coercion would change every float's
    * rendering, not just zero's). NaN needs nothing: it renders
    * "NaN" identically on both sides.
    */
  private def normZero(
      c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.DoubleType =>
      when(c === lit(0.0d), lit(0.0d)).otherwise(c)
    case org.apache.spark.sql.types.FloatType =>
      when(c === lit(0.0f), lit(0.0f)).otherwise(c)
    case _ => c
  }

  /** Build the filter: dense little-endian word array of `mBits` bits
    * with all k positions of every distinct non-null key set. One
    * distinct-free pass (duplicate keys set the same bits — `bit_or` is
    * idempotent, so no `distinct` shuffle is needed), one aggregate,
    * one bounded collect.
    */
  def buildBits(dim: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(k > 0, s"k must be positive, got $k")
    val key = normZero(col(keyCol), dim.schema(keyCol).dataType)
    val pos = dim.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(i => position(key, i, mBits)): _*)).as("pos"))
    val words = pos
      .select((col("pos") / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("mask"))
      .groupBy("word").agg(bit_or(col("mask")).as("mask"))
      .collect()
    val bits = new Array[Long](mBits / 64)
    words.foreach(r => bits(r.getInt(0)) |= r.getLong(1))
    bits
  }

  /** Membership predicate: true iff all k bits for `key` are set. May
    * return true for absent keys (false-positive rate ≈
    * (1-e^(-kn/m))^k); never false for a key that was built in. NULL
    * keys test NULL, so a filter on this drops them — matching semi
    * join semantics, where a NULL key never matches.
    *
    * Each of the k tests recomputes its position to index the word and
    * derive the in-word bit (the Catalyst inline trap: `pos` referenced
    * twice = two md5 evaluations). That is 2k allocation-free
    * [[graft.functions.Md5Long64]] kernel calls per row, inside
    * whole-stage codegen — cheaper than the projection boundary that
    * let-binding k positions through an interpreted HOF would cost.
    */
  def mightContain(key: Column, bits: Array[Long], k: Int): Column = {
    require(bits.nonEmpty && k > 0)
    val mBits = bits.length * 64
    val words = typedlit(bits.toSeq)
    (0 until k).map { i =>
      val word = element_at(words, (position(key, i, mBits) / 64).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), (position(key, i, mBits) % 64).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  /** Bloom-pruned exact semi join: filter `fact` by a bloom of the dim
    * keys (map-side, pre-shuffle), then LEFT SEMI against the dim to
    * remove false positives. Result rows are EXACTLY the plain semi
    * join's — the bloom only shrinks what the shuffle carries.
    *
    * SIZE mBits to the dim: ~10 bits per distinct dim key (FPR ~1% at
    * k=5). The default (2^16) suits dims up to a few thousand keys; a
    * 10M-key dim saturates it to FPR ≈ 1.0 — every fact row passes,
    * the full shuffle still happens, and each row paid 2k hash kernels
    * for nothing (strictly worse than the plain semi join). The build
    * measures the realized fill fraction for free and WARNS on stderr
    * past 50% so a mis-sized filter is visible, not silent.
    */
  def prunedSemiJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      mBits: Int = 1 << 16, k: Int = 5): DataFrame = {
    // the bloom hashes the key's STRING rendering while the verify
    // join compares under SQL coercion — a DOUBLE 5.0 fact key would
    // hash "5.0", miss the bits of an INT dim key's "5", and be
    // silently dropped from the "exact" result. Identical types make
    // the renderings agree; refuse anything else up front.
    require(fact.schema(factKey).dataType == dim.schema(dimKey).dataType,
      s"fact/dim key types must match exactly (bloom hashes the string " +
        s"rendering): ${fact.schema(factKey).dataType.simpleString} vs " +
        s"${dim.schema(dimKey).dataType.simpleString}")
    val bits = buildBits(dim, dimKey, mBits, k)
    // realized fill fraction from the built words (driver-side
    // popcount, no extra job): f ≈ 1 - e^(-kn/m), FPR ≈ f^k — past
    // 50% fill the filter stops earning its hash kernels
    val fill = bits.map(java.lang.Long.bitCount(_)).sum.toDouble / mBits
    if (fill > 0.5)
      System.err.println(
        f"[bloom] WARNING: filter ${fill * 100}%.0f%% saturated " +
          f"(approx FPR ${math.pow(fill, k) * 100}%.0f%%) — size mBits " +
          "to ~10 bits per distinct dim key or skip the bloom")
    // child-qualified join keys: with factKey == dimKey (the common
    // shared-name schema) a bare col(...) === col(...) is ambiguous.
    // No distinct() on the dim side: LEFT SEMI already emits each
    // pruned fact row at most once whatever the dim's duplication — a
    // pre-distinct would add a full exchange+aggregate over the dim
    // key for nothing, in the operator whose purpose is shuffle
    // minimization.
    val dimK = dim.select(col(dimKey))
    // probe under the same -0.0 normalization the build used (see
    // normZero) — callers using mightContain standalone on raw float/
    // double keys must normalize the same way
    val pruned = fact.filter(mightContain(
      normZero(col(factKey), fact.schema(factKey).dataType), bits, k))
    pruned.join(dimK, pruned.col(factKey) === dimK.col(dimKey), "left_semi")
  }
}
