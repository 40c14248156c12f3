package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profile, Sampling, SkewJoin, TfIdf}

class ProfileSpec extends SparkTestBase {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("numericProfile matches directly computed stats and handles nulls") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.5, 4.0), (null, 6.0), (4.5, null))
      .toDF("a", "b")
    val p = rows(Profile.numericProfile(df, Seq("a", "b")).orderBy(col("col_name")))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(p === Seq(
      ("a", 4L, 1L, 1.0, 4.5, 8.0 / 3),
      ("b", 4L, 2L, 4.0, 6.0, 5.0)).map(t =>
      (t._1, t._2, t._3, t._4, t._5,
        BigDecimal(t._6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("numericProfile survives NaN/Infinity under ANSI; mean is over finite values") {
    import spark.implicits._
    val df = Seq(1.0, Double.NaN, Double.PositiveInfinity, 3.0).toDF("a")
    val p = rows(Profile.numericProfile(df, Seq("a"))).head
    assert(p.getLong(1) === 4L && p.getLong(2) === 0L)
    assert(p.getDouble(3) === 1.0)      // min ignores NaN (ranks largest)
    assert(p.getDouble(5) === 2.0)      // mean of the finite {1.0, 3.0}
  }

  test("numericProfile profiles every column in one scan") {
    val plan = planString(
      Profile.numericProfile(docs, Seq("doc_id", "n_chars")))
    // one aggregate pass over one scan — not a scan per column
    assert(plan.split("Scan parquet").length - 1 === 1, plan)
  }

  test("histogram: totals reconcile, bounds clamp, empty buckets emitted, NaN dropped") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 0.5, 9.99, 10.0, 25.0, Double.NaN).toDF("x")
    val h = rows(Profile.histogram(df, "x", lo = 0.0, hi = 10.0, nBuckets = 5)
      .orderBy(col("bucket")))
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(h.map(_._1) === Seq(0L, 1L, 2L, 3L, 4L)) // full spine
    assert(h.map(_._4).sum === 6L)                  // every row lands somewhere
    assert(h.head._4 === 3L)  // -5 clamps in, 0 and 0.5 belong
    assert(h.last._4 === 3L)  // 9.99 in-range, 10 and 25 clamp into the top
    assert(h(1)._4 === 0L && h(2)._4 === 0L && h(3)._4 === 0L)
    assert(h.head._2 === 0.0 && h.last._3 === 10.0)
  }

  test("winsorize clips to the exact interpolated cut points, rows preserved") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val w = Profile.winsorize(df, "x", 0.05, 0.95)
    val clipped = rows(w.select(col("x_clipped"))).map(_.getDouble(0))
    // quantile_cont over 1..100: p05 = 1 + 0.05·99 = 5.95, p95 = 95.05
    assert(clipped.min === 5.95 && clipped.max === 95.05)
    assert(clipped.size === 100 && w.columns.contains("x"))
    // cut points ride a broadcast, not a shuffle of the rows
    assert(planString(w).contains("BroadcastNestedLoopJoin")
      || planString(w).contains("BroadcastExchange"), planString(w))
  }

  test("quantileBucket: balanced buckets on skewed data, exact cut semantics, null/NaN to null") {
    import spark.implicits._
    // heavily skewed: equi-width would dump ~everything in bucket 0,
    // equi-frequency holds exactly 25 per bucket
    val vals = (1 to 96).map(_.toDouble) ++ Seq(1e6, 2e6, 3e6, 4e6)
    val counts = rows(Profile.quantileBucket(vals.toDF("x"), "x", k = 4)
      .select(col("x_qbucket"))).map(_.getInt(0))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(counts === Map(0 -> 25, 1 -> 25, 2 -> 25, 3 -> 25))
    // at-cut boundary: over 1..9 the exact quartile cuts ARE data
    // values (3, 5, 7); strict > keeps each in its LOWER bucket
    val nine = rows(Profile.quantileBucket(
      (1 to 9).map(_.toDouble).toDF("x"), "x", 4)
      .select(col("x"), col("x_qbucket")))
      .map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(nine(3.0) === 0 && nine(5.0) === 1 && nine(7.0) === 2)
    assert(nine(1.0) === 0 && nine(9.0) === 3)
    // NULL and NaN rows get a NULL bucket, never a clamped one
    val weird = Seq(Option(1.0), Option(2.0), Option(3.0), Option(4.0),
      None, Some(Double.NaN)).toDF("x")
    val wb = rows(Profile.quantileBucket(weird, "x", 2)
      .select(col("x"), col("x_qbucket")))
    wb.foreach { r =>
      val isWeird = r.isNullAt(0) || r.getDouble(0).isNaN
      assert(r.isNullAt(1) === isWeird, r.toString)
    }
  }

  test("quantileBucketByGroup: cuts are per group; null groups and values get null buckets") {
    import spark.implicits._
    // group a: 1..8 (median 4.5); group b: 101..108 — a GLOBAL cut
    // would put all of b in the top bucket
    val df = ((1 to 8).map(v => (Some("a"), Some(v.toDouble))) ++
      (101 to 108).map(v => (Some("b"), Some(v.toDouble))) :+
      ((Option.empty[String], Some(1.0))) :+ ((Some("a"), Option.empty[Double])))
      .toDF("g", "x")
    val out = rows(Profile.quantileBucketByGroup(df, "g", "x", k = 2)
      .select(col("g"), col("x"), col("x_qbucket")))
      .map(r => (Option(r.getAs[String]("g")),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Int])))
    // each group splits at its OWN median: 4 low + 4 high per group
    Seq("a", "b").foreach { g =>
      val bs = out.collect { case (Some(`g`), Some(_), Some(b)) => b }
      assert(bs.count(_ == 0) === 4 && bs.count(_ == 1) === 4, s"group $g: $bs")
    }
    // null group and null value → null bucket
    assert(out.collect { case (None, _, b) => b } === Seq(None))
    assert(out.collect { case (Some("a"), None, b) => b } === Seq(None))
  }

  test("madOutliers: outliers cannot drag the fence; flags match the rule exactly") {
    import spark.implicits._
    // 99 values near 10 plus one wild outlier: mean/stddev z-scores
    // would move with the outlier; median=10, MAD stays ~1
    val vals = (1 to 99).map(i => 10.0 + (i % 3) - 1) :+ 1e6
    val out = rows(Profile.madOutliers(vals.toDF("x"), "x", nMads = 3.0)
      .select(col("x"), col("x_dev"), col("x_outlier")))
      .map(r => (r.getDouble(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.count(_._3) === 1)
    assert(out.find(_._3).get._1 === 1e6)
    // the rule is exactly |x - med| > 3*MAD with med/MAD from the data
    // (n=100 → quantile_cont(0.5) interpolates ranks 49/50)
    val medInterp = (vals.sorted.apply(49) + vals.sorted.apply(50)) / 2
    val devs = vals.map(v => math.abs(v - medInterp)).sorted
    val mad = (devs(49) + devs(50)) / 2
    out.foreach { case (x, dev, flag) =>
      assert(dev === math.abs(x - medInterp))
      assert(flag === dev > 3.0 * mad)
    }
  }

  test("keySkewStats finds the planted hot key with its exact share") {
    import spark.implicits._
    val df = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"k$i")).toDF("k")
    val s = rows(SkewJoin.keySkewStats(df, "k", 3))
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(s.head === ("hot", 60L, 0.6))
    assert(s.size === 3 && s(1)._2 === 1L) // remaining keys tie at 1, name order
    assert(s(1)._1 === "k1" && s(2)._1 === "k10")
  }

  test("keySkewStats plans a TakeOrderedAndProject, not a global sort") {
    val plan = planString(SkewJoin.keySkewStats(docs, "source", 5))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("corpusTopNgrams counts occurrences and document frequency exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c"),   // "a b" x2, "b a" x1, "b c" x1
      (2L, "a b"),         // "a b" x1
      (3L, "z")            // shorter than n: contributes nothing
    ).toDF("doc_id", "text")
    val top = rows(TfIdf.corpusTopNgrams(df, 2, 10))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top === Seq(("a b", 3L, 2L), ("b a", 1L, 1L), ("b c", 1L, 1L)))
  }

  test("oovRate: coverage against the top-V vocab with deterministic tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b b c"),  // vocab@2 = {a, b}: c is OOV → 1/6
      (2L, "a b rare"),     // rare is OOV → 1/3
      (3L, "a a a a")       // fully covered → 0
    ).toDF("doc_id", "text")
    val out = rows(TfIdf.oovRate(df, 2).orderBy(col("doc_id")))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out === Seq(
      (1L, 6L, 1L, 0.166667), (2L, 3L, 1L, 0.333333), (3L, 4L, 0L, 0.0)))
    // tie-break: b and c both count 1 → token-ascending picks b
    val tied = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val t = rows(TfIdf.oovRate(tied, 2).orderBy(col("doc_id")))
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(t === Seq((1L, 0L), (2L, 1L))) // vocab = {a, b}; c is OOV
  }

  test("temperatureResample: alpha=1 keeps all, rates shrink with group size, stable") {
    val n = docs.count()
    assert(Sampling.temperatureResample(docs, "lang", "doc_id", 1.0).count() === n)
    val kept = Sampling.temperatureResample(docs, "lang", "doc_id", 0.5)
    val rates = rows(kept.select(col("lang"), col("keep_rate")).distinct())
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sizes = rows(docs.groupBy(col("lang")).count())
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = sizes.values.min
    // the smallest group keeps everything; rates are exactly sqrt(nmin/n)
    rates.foreach { case (g, r) =>
      assert(math.abs(r - math.sqrt(nMin.toDouble / sizes(g))) < 1e-12)
    }
    // decisions are a pure key function: identical under repartitioning
    val ids = rows(kept.select(col("doc_id"))).map(_.getLong(0)).toSet
    val again = rows(Sampling.temperatureResample(
      docs.repartition(9), "lang", "doc_id", 0.5)
      .select(col("doc_id"))).map(_.getLong(0)).toSet
    assert(again === ids)
    // direction: the biggest group retains a smaller fraction than the smallest
    val keptSizes = rows(kept.groupBy(col("lang")).count())
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = sizes.maxBy(_._2)._1
    val small = sizes.minBy(_._2)._1
    assert(keptSizes(small) === sizes(small)) // rate 1.0 keeps every row
    assert(keptSizes(big).toDouble / sizes(big) < 1.0)
  }

  test("categoricalProfile: top-k, shares, null and distinct counts, tie-break") {
    import spark.implicits._
    import graft.operators.Profile
    val df = Seq(
      ("a", "x"), ("a", "y"), ("a", null), ("b", "y"),
      ("b", null), ("a", "x"), ("c", "y")
    ).toDF("s1", "s2")
    val out = rows(Profile.categoricalProfile(df, Seq("s1", "s2"), k = 2)
      .orderBy(col("col_name"), col("val_rank")))
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4), r.getLong(5), r.getLong(6)))
    // s1: a=4, b=2, c=1, no nulls, 3 distinct -> top2 = a, b
    // s2: x=2, y=3, null=2, 2 distinct -> top2 = y, x
    assert(out === Seq(
      ("s1", "a", 4L, 0.571429, 1, 0L, 3L), // shares rounded to 6
      ("s1", "b", 2L, 0.285714, 2, 0L, 3L),
      ("s2", "y", 3L, 0.6, 1, 2L, 2L),
      ("s2", "x", 2L, 0.4, 2, 2L, 2L)))

    // deterministic tie-break: equal counts rank by value ascending
    val tied = Seq("m", "z", "m", "z").toDF("c")
    val tr = rows(Profile.categoricalProfile(tied, Seq("c"), k = 2)
      .orderBy(col("val_rank"))).map(r => (r.getString(1), r.getInt(4)))
    assert(tr === Seq(("m", 1), ("z", 2)))
  }

  test("pearsonExact: hand-computed correlations, zero-variance NULL, listwise deletion") {
    import spark.implicits._
    // y = 2x (corr +1); z anti-ordered with x (corr -1 for this data);
    // w constant (zero variance -> NULL)
    val df = Seq(
      (1.0, 2.0, 3.0, 5.0),
      (2.0, 4.0, 2.0, 5.0),
      (3.0, 6.0, 1.0, 5.0)).toDF("x", "y", "z", "w")
    val out = rows(Profile.pearsonExact(df, Seq("x", "y", "z", "w"))).head
    assert(out.getLong(0) === 3L)
    assert(out.getDouble(1) === 1.0)   // corr_x_y
    assert(out.getDouble(2) === -1.0)  // corr_x_z
    assert(out.isNullAt(3), "zero-variance column must yield NULL")  // corr_x_w

    // a null in ANY profiled column drops the whole row (listwise)
    val withNull = Seq(
      (Some(1.0), Some(2.0)), (Some(2.0), None), (Some(3.0), Some(6.0))
    ).toDF("x", "y")
    val o2 = rows(Profile.pearsonExact(withNull, Seq("x", "y"))).head
    assert(o2.getLong(0) === 2L && o2.getDouble(1) === 1.0)

    // non-perfect correlation, cross-checked against the closed form:
    // x=(1,2,3), v=(1,1,2) -> r = (3*9-6*4)/(sqrt(3*14-36)*sqrt(3*6-16))
    val mix = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 2.0)).toDF("x", "v")
    val o3 = rows(Profile.pearsonExact(mix, Seq("x", "v"))).head
    val expected = math.rint(3.0 / (math.sqrt(6.0) * math.sqrt(2.0)) * 1e6) / 1e6
    assert(math.abs(o3.getDouble(1) - expected) < 1e-9)
  }

  test("pearsonExact: single scan, one exchange, partial aggregation") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (2.0, 1.0)).toDF("x", "y")
    val p = planString(Profile.pearsonExact(df, Seq("x", "y")))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("mutualInformation: independent columns 0, deterministic function ln|X|, counts audited") {
    import spark.implicits._
    // independent: every (x, y) cell equally likely -> MI = 0
    val indep = (for { x <- Seq("a", "b"); y <- Seq("u", "v") } yield (x, y))
      .toDF("x", "y")
    val oi = rows(Profile.mutualInformation(indep, "x", "y")).head
    assert(oi.getDouble(0) === 0.0 && oi.getLong(1) === 4L && oi.getLong(2) === 4L)
    // y = f(x) bijective over 2 uniform values -> MI = ln 2
    val dep = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v")).toDF("x", "y")
    val od = rows(Profile.mutualInformation(dep, "x", "y")).head
    val ln2 = math.rint(math.log(2.0) * 1e6) / 1e6
    assert(math.abs(od.getDouble(0) - ln2) < 1e-9)
    assert(od.getLong(2) === 2L)
    // nulls carry no probability mass
    val withNull = Seq(("a", Some("u")), ("b", None)).toDF("x", "y")
    assert(rows(Profile.mutualInformation(withNull, "x", "y")).head.getLong(1) === 1L)
  }

  test("ksTwoSample: disjoint slices score 1, identical slices score 0, hand-computed middle") {
    import spark.implicits._
    val lo = Seq(1.0, 2.0, 3.0).toDF("v")
    val hi = Seq(10.0, 11.0).toDF("v")
    val d1 = rows(Profile.ksTwoSample(lo, hi, "v")).head
    assert(d1.getDouble(0) === 1.0 && d1.getLong(2) === 3L && d1.getLong(3) === 2L)
    assert(d1.getDouble(1) === 3.0) // gap peaks at the last low value
    val same = rows(Profile.ksTwoSample(lo, lo, "v")).head
    assert(same.getDouble(0) === 0.0)
    // a={1,2}, b={2,4}: steps at 1: |1/2-0|=.5, 2: |1-1/2|=.5, 4: 0
    // tie on the gap -> smallest value reported
    val a = Seq(1.0, 2.0).toDF("v"); val b = Seq(2.0, 4.0).toDF("v")
    val m = rows(Profile.ksTwoSample(a, b, "v")).head
    assert(m.getDouble(0) === 0.5 && m.getDouble(1) === 1.0)
  }

  test("ksTwoSample: an empty slice reads NULL ks_stat, not an ANSI divide-by-zero") {
    import spark.implicits._
    val lo = Seq(1.0, 2.0, 3.0).toDF("v")
    val empty = Seq.empty[Double].toDF("v")
    val d = rows(Profile.ksTwoSample(lo, empty, "v")).head
    assert(d.isNullAt(0), "degenerate feed flags as NULL, never kills the job")
    assert(d.getLong(2) === 3L && d.getLong(3) === 0L)
  }

  test("rollingCorr/linearFit: a finite-but-huge row costs itself, not the job") {
    import spark.implicits._
    // 1e20 passed the old 1e36 single-cast bound, but its scaled
    // square overflowed DECIMAL(38,0) in sum(x*x) and ANSI-killed the
    // profile — the chain bound (9e11) drops the row instead
    val df = Seq((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0),
      (4L, 1e20, 1e20)).toDF("t", "x", "y")
    val fit = rows(Profile.linearFit(df, "x", "y")).head
    assert(fit.getLong(0) === 3L, "the huge row is excluded from n")
    assert(math.abs(fit.getDouble(1) - 2.0) < 1e-9)
    val rc = rows(Profile.rollingCorr(df, Seq.empty, "t", "x", "y", 3, 2))
    assert(rc.size === 4, "all rows emit; the huge row just contributes no moment")
  }

  test("psi: identical slices ~0, planted shift alarms, empty slice reads NULL") {
    import spark.implicits._
    val base = (1 to 200).map(_.toDouble).toDF("v")
    val same = rows(Profile.psi(base, base, "v", bins = 10)).head
    assert(same.getDouble(0) === 0.0)
    assert(same.getLong(1) === 200L && same.getLong(3) === 10L)
    // current slice shifted entirely into the top reference decile
    val shifted = (300 to 400).map(_.toDouble).toDF("v")
    val drift = rows(Profile.psi(base, shifted, "v", bins = 10)).head
    assert(drift.getDouble(0) > 0.25, s"expected alarm-level psi, got $drift")
    // empty side: NULL psi instead of an ANSI division failure
    val empty = Seq.empty[Double].toDF("v")
    assert(rows(Profile.psi(base, empty, "v", bins = 10)).head.isNullAt(0))
  }
  test("concentration: even split reads gini 0, monopoly reads (n-1)/n") {
    import spark.implicits._
    val even = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L)).toDF("g", "v")
    val e = rows(Profile.concentration(even, "g", "v")).head
    assert(e.getLong(0) === 4L && e.getLong(1) === 40L)
    assert(e.getDouble(2) === 0.0)
    assert(e.getDouble(3) === 0.25 && e.getDouble(4) === 0.25)
    val mono = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 40L)).toDF("g", "v")
    val m = rows(Profile.concentration(mono, "g", "v")).head
    assert(m.getDouble(2) === 0.75) // (n-1)/n with n=4
    assert(m.getDouble(3) === 1.0 && m.getDouble(4) === 1.0)
  }

  test("concentration matches a hand-computed case; NULL groups excluded") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L),
      (null.asInstanceOf[String], 99L)).toDF("g", "v")
    val r = rows(Profile.concentration(df, "g", "v")).head
    // sorted x = 1,2,3,4: sum(i*x)=30, sum(x)=10, n=4
    // gini = (2*30 - 5*10) / (4*10) = 0.25
    assert(r.getLong(0) === 4L && r.getLong(1) === 10L)
    assert(r.getDouble(2) === 0.25)
    assert(r.getDouble(3) === 0.3)  // (1+4+9+16)/100
    assert(r.getDouble(4) === 0.4)  // 4/10
  }

  test("kAnonymity: min group, small-group counts, NULL quasi values audited") {
    import spark.implicits._
    val df = Seq(("x", "1"), ("x", "1"), ("x", "1"), ("y", "1"), ("y", "1"),
      (null.asInstanceOf[String], "2")).toDF("q1", "q2")
    val r = rows(Profile.kAnonymity(df, Seq("q1", "q2"), k = 3)).head
    assert(r.getLong(0) === 6L)  // n_rows
    assert(r.getLong(1) === 3L)  // n_groups (NULL group counted)
    assert(r.getLong(2) === 1L)  // min_group -> "1-anonymous"
    assert(r.getLong(3) === 2L)  // groups below k
    assert(r.getLong(4) === 3L)  // rows at risk
    assert(r.getDouble(5) === 0.5)
  }

  test("chiSquared: proportional table reads 0; hand-computed 2x2 with V") {
    import spark.implicits._
    val indep = Seq(("a", "c"), ("a", "c"), ("a", "d"), ("a", "d"),
      ("b", "c"), ("b", "d")).toDF("x", "y")
    val z = rows(Profile.chiSquared(indep, "x", "y")).head
    assert(z.getDouble(0) === 0.0 && z.getLong(1) === 1L)
    // 2x2 cells (a,c)=3 (a,d)=1 (b,c)=1 (b,d)=3: every marginal 4, n=8
    // term = (8*3-16)^2/(8*16) = 0.5 or (8*1-16)^2/(8*16) = 0.5 -> chi2 = 2
    val dep = Seq(("a", "c"), ("a", "c"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("b", "d"), ("b", "d")).toDF("x", "y")
    val r = rows(Profile.chiSquared(dep, "x", "y")).head
    assert(r.getDouble(0) === 2.0)
    assert(r.getLong(1) === 1L)
    assert(r.getDouble(2) === 0.5) // sqrt(2 / (8 * 1))
    assert(r.getLong(3) === 8L && r.getLong(4) === 4L)
  }

  test("vocabGrowth accumulates tokens and first-seen vocab per checkpoint") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c d d"))
      .toDF("doc_id", "text")
    val g = rows(graft.operators.TfIdf.vocabGrowth(docs, every = 1))
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g === Seq((1, 1L, 3L, 2L), (2, 2L, 5L, 3L), (3, 3L, 8L, 4L)))
  }

  test("noveltyRates: first doc fully novel, repeats score their new share") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a b"))
      .toDF("doc_id", "text")
    val n = rows(graft.operators.TfIdf.noveltyRates(docs))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(n === Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0)))
  }

  test("noveltyRates: a tokenless doc keeps its spine row (0, 0, NULL novelty)") {
    import spark.implicits._
    // a blank doc explodes to zero rows and used to VANISH — a caller
    // joining novelty back onto the corpus lost it with nothing to see
    val docs = Seq((1L, "a b"), (2L, "   "), (3L, "b c"))
      .toDF("doc_id", "text")
    val n = rows(graft.operators.TfIdf.noveltyRates(docs))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(n === Seq((1L, 2L, 2L, 1.0), (2L, 0L, 0L, null), (3L, 2L, 1L, 0.5)))
  }
  test("jensenShannon: identical mixes read 0, disjoint mixes read ln 2") {
    import spark.implicits._
    val x = Seq("a", "a", "b").toDF("c")
    val same = rows(Profile.jensenShannon(x, x, "c")).head
    assert(same.getDouble(0) === 0.0 && same.getDouble(1) === 0.0)
    val y = Seq("c", "d").toDF("c")
    val far = rows(Profile.jensenShannon(x, y, "c")).head
    assert(far.getDouble(1) === 1.0) // disjoint supports saturate at 1 bit
    assert(far.getLong(2) === 3L && far.getLong(3) === 2L
      && far.getLong(4) === 4L)
  }

  test("jensenShannon handles one-sided categories without ln(0)") {
    import spark.implicits._
    val a = Seq("x", "x", "y").toDF("c")
    val b = Seq("x").toDF("c")
    val r = rows(Profile.jensenShannon(a, b, "c")).head
    // p(x)=2/3 q(x)=1 m=5/6; p(y)=1/3 q(y)=0 m=1/6
    val expected = ((2.0/3) * math.log((2.0/3) / (5.0/6))
      + (1.0/3) * math.log((1.0/3) / (1.0/6))) / 2 +
      (1.0 * math.log(1.0 / (5.0/6))) / 2
    assert(math.abs(r.getDouble(0) - expected) < 1e-6)
  }

  test("flesch readability counts words, sentence runs, vowel groups") {
    import spark.implicits._
    val df = Seq((1L, "The cat sat. The dog ran!"), (2L, "no terminal punct"))
      .toDF("doc_id", "text")
    val r = rows(df.select(col("doc_id"),
      graft.functions.Text.tokenCount(col("text")).as("w"),
      graft.functions.Text.sentenceCount(col("text")).as("s"),
      graft.functions.Text.syllableCountApprox(col("text")).as("sy"),
      round(graft.functions.Text.fleschReadingEase(col("text")), 6)
        .as("f")).orderBy(col("doc_id")))
    assert(r(0).getInt(1) === 6 && r(0).getInt(2) === 2
      && r(0).getInt(3) === 6)
    assert(r(0).getDouble(4) === BigDecimal(206.835 - 1.015 * 3.0 - 84.6 * 1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(1).getInt(2) === 1) // sentence floor
  }
  test("benford: digits from exact hundredths, spine emits zero digits") {
    import spark.implicits._
    // one value per leading digit 1..9 (mixed magnitudes incl. 0.05),
    // zero/negative/null excluded
    val df = Seq[java.lang.Double](1.0, 25.0, 300.0, 4000.0, 0.05, 6.1,
      70.0, 800.0, 9.99, 0.0, -5.0, null).toDF("x")
    val r = rows(Profile.benford(df, "x").orderBy(col("digit")))
    assert(r.map(_.getInt(0)) === (1 to 9))
    assert(r.map(_.getLong(1)).sum === 9L)
    assert(r.forall(_.getLong(1) === 1L))
    val d1 = r.head
    assert(d1.getDouble(3) === BigDecimal(math.log10(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // uniform digits sit BELOW benford for 1 and ABOVE for 9
    assert(d1.getDouble(4) < 0 && r.last.getDouble(4) > 0)
    // sub-cent positives (hundredths round to 0 -> no readable first
    // digit at this scaling) are EXCLUDED from counts AND total — the
    // stated population contract, not a silent join artifact
    val sub = Seq[java.lang.Double](1.0, 25.0, 0.004, 0.0049).toDF("x")
    val rs = rows(Profile.benford(sub, "x").orderBy(col("digit")))
    assert(rs.map(_.getLong(1)).sum === 2L)
    assert(rs.head.getDouble(2) === 0.5) // share over the 2 retained rows
  }
  test("bm25: rarity, term frequency, and length normalization behave") {
    import spark.implicits._
    val df = Seq(
      (1L, "x x common"),          // rare term twice, short doc
      (2L, "x common common pad"), // rare once, common twice, longer
      (3L, "common pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val r = rows(TfIdf.bm25(df, Seq("x", "common"), k1 = 1.2, b = 0.75)
      .orderBy(col("doc_id")))
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.map(_._1) === Seq(1L, 2L, 3L))
    assert(r(0)._3 === 2L && r(1)._3 === 2L && r(2)._3 === 1L)
    // doc 1 (rare term doubled, shortest) outscores doc 2, which
    // outscores the long common-only doc 3
    assert(r(0)._4 > r(1)._4 && r(1)._4 > r(2)._4, r.toString)
    intercept[IllegalArgumentException] {
      TfIdf.bm25(df, Seq("x", "x"), 1.2, 0.75)
    }
  }
  test("quantileMap: identity on itself, endpoints pin, midpoint interpolates") {
    import spark.implicits._
    val ref = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
    val same = rows(Profile.quantileMap(ref, ref, "v"))
      .map(r => (r.getDouble(0), r.getDouble(3)))
    same.foreach { case (v, m) => assert(m === v, s"identity broke at $v") }
    val two = Seq(0.0, 10.0).toDF("v")
    val cur = Seq(100.0, 200.0, 300.0).toDF("v")
    val m = rows(Profile.quantileMap(two, cur, "v")).map(_.getDouble(3))
    assert(m === Seq(0.0, 5.0, 10.0)) // min->min, mid->interpolated, max->max
  }

  test("rollingCorr: perfect correlation, anti-correlation, flat frame NULL") {
    import spark.implicits._
    val df = Seq((1, 1.0, 10.0, 5.0), (2, 2.0, 8.0, 5.0), (3, 3.0, 6.0, 5.0),
      (4, 4.0, 4.0, 5.0)).toDF("t", "x", "y", "c")
    val up = rows(Profile.rollingCorr(df, Seq.empty, "t", "x", "x", 3, 2)
      .orderBy(col("t")))
    assert(up.head.isNullAt(5))                 // n=1 < minPeriods
    assert(up.tail.forall(_.getDouble(5) === 1.0))
    val down = rows(Profile.rollingCorr(df, Seq.empty, "t", "x", "y", 3, 2)
      .orderBy(col("t")))
    assert(down.tail.forall(_.getDouble(5) === -1.0))
    val flat = rows(Profile.rollingCorr(df, Seq.empty, "t", "x", "c", 3, 2)
      .orderBy(col("t")))
    assert(flat.forall(_.isNullAt(5)))          // zero variance side
  }
  test("NaN/NULL policy: winsorize passes through NULL, cuts exclude NaN, benford survives junk, all-NULL column surfaces") {
    import spark.implicits._
    // winsorize: NULL must stay NULL (not the lo cut) and NaN must not
    // become the hi cut; NaN rows must not drag the cut points either
    val w = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), Some(5.0),
      None, Some(Double.NaN)).toDF("v")
    val clipped = rows(Profile.winsorize(w, "v", 0.2, 0.8))
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(clipped.count(_.isEmpty) === 2, s"NULL and NaN must clip to NULL: $clipped")
    assert(clipped.flatten.max <= 5.0 && !clipped.flatten.exists(_.isNaN))
    // quantileBucket: NaN share must not empty the top bucket
    val q = Seq(1.0, 2.0, 3.0, 4.0, Double.NaN, Double.NaN).toDF("v")
    val buckets = rows(Profile.quantileBucket(q, "v", 2))
      .filter(!_.isNullAt(1)).map(_.getInt(1)).toSet
    assert(buckets === Set(0, 1), s"top bucket vanished: $buckets")
    // benford: NaN and Infinity rows drop instead of killing the job
    val b = Seq(1.23, 45.6, Double.NaN, Double.PositiveInfinity, 7.89)
      .toDF("v")
    assert(rows(Profile.benford(b, "v")).map(_.getLong(1)).sum === 3L)
    // categoricalProfile: a 100%-NULL column still surfaces its count
    val c = Seq(("a", null: String), ("b", null: String)).toDF("k", "dead")
    val prof = rows(Profile.categoricalProfile(c, Seq("k", "dead"), 3))
    val dead = prof.filter(_.getString(0) == "dead")
    assert(dead.size === 1 && dead.head.getLong(5) === 2L,
      s"all-NULL column vanished from the profile: $prof")
  }

  test("rollingCorr: a NULL on either side drops the PAIR from count and moments") {
    import spark.implicits._
    val df = Seq((1, Some(1.0), Some(1.0)), (2, Some(2.0), Some(2.0)),
      (3, None: Option[Double], Some(9.0)), (4, Some(4.0), Some(4.0)))
      .toDF("t", "x", "y")
    val out = rows(Profile.rollingCorr(df, Seq.empty, "t", "x", "y", 4, 2)
      .orderBy(col("t")))
    // at t=4 the frame holds 3 paired observations (t=3's pair is
    // incomplete): count must say 3, and the correlation over the
    // remaining colinear pairs must be exactly 1, not a mixed-n value
    assert(out.last.getLong(3) === 3L, s"n_window counted unpaired rows: $out")
    assert(out.last.getDouble(4) === 1.0)
  }

  test("ksTwoSample: NaN rows never read as drift") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, Double.NaN, Double.NaN).toDF("v")
    val b = Seq(1.0, 2.0).toDF("v")
    val r = rows(Profile.ksTwoSample(a, b, "v")).head
    assert(r.getDouble(0) === 0.0,
      "identical real-valued distributions must read ks_stat 0 despite NaN share")
  }

  test("rollingCorr: an Infinity/1e37 row drops from the pair, never kills the job") {
    import spark.implicits._
    val df = Seq(
      (1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, Double.PositiveInfinity, 3.0),
      (4L, 4.0, 4.0), (5L, 5.0, 5.0)
    ).toDF("t", "x", "y")
    // the unguarded DECIMAL(38,0) cast raised CAST_OVERFLOW under ANSI
    val out = rows(Profile.rollingCorr(df, Nil, "t", "x", "y",
      window = 5, minPeriods = 2))
    assert(out.size === 5)
    assert(out.last.getAs[Long]("n_window") === 4) // the Inf pair dropped
  }

  test("quantileMap: a single-row reference yields NULL mapped (documented contract)") {
    import spark.implicits._
    val ref = Seq(42.0).toDF("v")
    val cur = Seq(1.0, 2.0, 3.0).toDF("v")
    val out = rows(Profile.quantileMap(ref, cur, "v"))
    assert(out.nonEmpty && out.forall(_.isNullAt(3)),
      "no span to interpolate — mapped must be NULL, not the one ref value")
  }

  test("quantileMap property: monotone, bounded by the reference range") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    for (trial <- 1 to 4) {
      val ref = Seq.fill(5 + rnd.nextInt(40))(
        math.floor(rnd.nextDouble() * 1000) / 10).toDF("v")
      val cur = Seq.fill(5 + rnd.nextInt(40))(
        math.floor(rnd.nextDouble() * 2000) / 10).toDF("v")
      val out = rows(Profile.quantileMap(ref, cur, "v"))
        .map(r => (r.getDouble(0), r.getDouble(3)))
      assert(out.map(_._1) === out.map(_._1).sorted)
      assert(out.map(_._2) === out.map(_._2).sorted,
        s"trial $trial: mapped not monotone")
      val refVals = rows(ref.orderBy(col("v"))).map(_.getDouble(0))
      out.foreach { case (_, m) =>
        assert(m >= refVals.min - 1e-9 && m <= refVals.max + 1e-9)
      }
    }
  }
  test("hashedFeatures: counts preserved, equal values share an index, NULL marked") {
    import spark.implicits._
    val df = Seq((1L, Option("a"), Option("x")), (2L, Option("a"), None),
      (3L, Option("b"), Option("x"))).toDF("id", "f1", "f2")
    val out = rows(graft.operators.Features.hashedFeatures(
      df, "id", Seq("f1", "f2"), dim = 64).orderBy(col("id")))
    def vec(s: String) = s.split(",").map { t =>
      val Array(i, c) = t.split(":"); (i.toLong, c.toLong) }.toMap
    val v = out.map(r => (r.getLong(0), vec(r.getString(2)))).toMap
    // total count = number of feature columns, always
    v.values.foreach(m => assert(m.values.sum === 2L))
    // rows 1 and 2 share f1=a -> share that index; row 3 differs on f1
    val shared = v(1L).keySet.intersect(v(2L).keySet)
    assert(shared.nonEmpty)
    // rows 1 and 3 share f2=x
    assert(v(1L).keySet.intersect(v(3L).keySet).nonEmpty)
    // row 2's NULL f2 hashes as the missing marker, distinct from f2=x
    assert(v(2L) !== v(1L))
  }
  test("imputeWithGroupMean: own-group mean fills, all-null group stays NULL") {
    import spark.implicits._
    val df = Seq(
      ("a", Option(2.0)), ("a", Option(4.0)), ("a", Option.empty[Double]),
      ("b", Option(10.0)), ("b", Option.empty[Double]),
      ("c", Option.empty[Double])).toDF("g", "v")
    val out = rows(graft.operators.Features.imputeWithGroupMean(df, "g", "v")
      .orderBy(col("g"), col("v").asc_nulls_last))
      .map(r => (r.getString(0), r.isNullAt(1), 
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2), r.getBoolean(3)))
    assert(out(2) === (("a", true, 3.0, true)))   // mean of 2,4
    assert(out(4) === (("b", true, 10.0, true)))
    assert(out(5)._1 === "c" && out(5)._3.isNaN && !out(5)._4) // no mean exists
    assert(out(0) === (("a", false, 2.0, false))) // observed rows untouched
  }
  test("histogram2d: totals reconcile, both axes clamp, empty cells emitted") {
    import spark.implicits._
    val df = Seq((-5.0, 0.5), (0.0, 0.5), (9.0, 2.5), (20.0, 99.0),
      (Double.NaN, 1.0), (3.0, Double.NaN)).toDF("x", "y")
    val h = rows(Profile.histogram2d(df, "x", 0.0, 10.0, 2, "y", 0.0, 3.0, 3)
      .orderBy(col("bucket_x"), col("bucket_y")))
    assert(h.size === 6) // full 2x3 spine
    assert(h.map(_.getLong(4)).sum === 4L) // NaN rows dropped, rest land
    val cell = h.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(cell((0L, 0L)) === 2L) // -5 clamps in; 0.0 belongs
    assert(cell((1L, 2L)) === 2L) // 20 and 99 clamp into the top cell
  }
  test("linearFit recovers an exact line; degenerate x reads NULL") {
    import spark.implicits._
    val line = Seq((1.0, 5.0), (2.0, 7.0), (3.0, 9.0), (4.0, 11.0))
      .toDF("x", "y") // y = 2x + 3
    val r = rows(Profile.linearFit(line, "x", "y")).head
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 2.0 && r.getDouble(2) === 3.0)
    assert(r.getDouble(3) === 1.0)
    // noisy but centered: slope 0, r2 0
    val flat = Seq((1.0, 10.0), (2.0, 0.0), (3.0, 10.0), (4.0, 0.0),
      (1.0, 0.0), (2.0, 10.0), (3.0, 0.0), (4.0, 10.0)).toDF("x", "y")
    val f = rows(Profile.linearFit(flat, "x", "y")).head
    assert(f.getDouble(1) === 0.0 && f.getDouble(3) === 0.0)
    // constant x: vertical line, no fit
    val vert = Seq((2.0, 1.0), (2.0, 5.0)).toDF("x", "y")
    val v = rows(Profile.linearFit(vert, "x", "y")).head
    assert(v.isNullAt(1) && v.isNullAt(2) && v.isNullAt(3))
  }
}
