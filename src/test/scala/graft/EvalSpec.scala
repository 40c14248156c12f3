package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval

class EvalSpec extends SparkTestBase {
  import spark.implicits._

  private def auc(rows0: Seq[(Double, Int)]): Double =
    rows(Eval.aucByRank(rows0.toDF("s", "y").repartition(3), "s", "y"))
      .head.getDouble(0)

  test("AUC: perfect separation is 1, inverted is 0, constant scores are 0.5") {
    val sep = Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1))
    assert(auc(sep) === 1.0)
    assert(auc(sep.map { case (s, y) => (s, 1 - y) }) === 0.0)
    assert(auc(Seq((0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1))) === 0.5)
  }

  test("AUC matches brute-force concordance counting with tie credit on random data") {
    val rnd = new scala.util.Random(3)
    val data = Seq.fill(300)((math.round(rnd.nextDouble() * 20) / 20.0, // heavy ties
      if (rnd.nextDouble() < 0.4) 1 else 0))
    val pos = data.filter(_._2 == 1).map(_._1)
    val neg = data.filter(_._2 == 0).map(_._1)
    val pairs = for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val brute = BigDecimal(pairs.sum / (pos.size.toDouble * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(auc(data) - brute) < 2e-6, s"${auc(data)} vs $brute")
  }

  test("AUC is invariant to partitioning and drops null scores/labels") {
    val data = Seq((0.3, 0), (0.7, 1), (0.5, 1), (0.4, 0))
    val withNulls = data.map { case (s, y) => (Some(s), Some(y)) } ++
      Seq((None, Some(1)), (Some(0.9), None))
    val clean = auc(data)
    val got = rows(Eval.aucByRank(
      withNulls.toDF("s", "y").repartition(5), "s", "y")).head
    assert(got.getDouble(0) === clean)
    assert(got.getLong(1) === 2L && got.getLong(2) === 2L)
  }

  test("PR curve: recall climbs to 1, precision matches brute force at every threshold") {
    val data = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.7, 1), (0.4, 0), (0.2, 1))
    val pr = rows(Eval.prCurve(data.toDF("s", "y"), "s", "y")
      .orderBy(col("threshold").desc))
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val nPos = data.count(_._2 == 1).toDouble
    pr.foreach { case (t, nPred, tp, prec, rec) =>
      val predicted = data.filter(_._1 >= t)
      assert(nPred === predicted.size.toLong)
      assert(tp === predicted.count(_._2 == 1).toLong)
      assert(prec === BigDecimal(tp / nPred.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(rec === BigDecimal(tp / nPos)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(pr.last._5 === 1.0) // lowest threshold predicts everything
    assert(pr.map(_._5) === pr.map(_._5).sorted) // recall non-decreasing
  }

  test("aucByRankGrouped: per-slice AUC matches the global operator per group") {
    import spark.implicits._
    // group a: perfect ranking (auc 1); group b: inverted (auc 0);
    // group c: all-positive -> NULL
    val df = Seq(
      ("a", 0.9, 1), ("a", 0.8, 1), ("a", 0.2, 0), ("a", 0.1, 0),
      ("b", 0.9, 0), ("b", 0.1, 1),
      ("c", 0.5, 1), ("c", 0.6, 1)).toDF("g", "s", "y")
    val out = rows(Eval.aucByRankGrouped(df, "g", "s", "y").orderBy(col("g")))
    assert(out(0).getString(0) === "a" && out(0).getDouble(1) === 1.0)
    assert(out(1).getString(0) === "b" && out(1).getDouble(1) === 0.0)
    assert(out(2).getString(0) === "c" && out(2).isNullAt(1))
    // each slice agrees with the ungrouped operator on that slice
    for (g <- Seq("a", "b")) {
      val solo = rows(Eval.aucByRank(df.filter(col("g") === g), "s", "y"))
        .head.getDouble(0)
      val sliced = out.find(_.getString(0) == g).get.getDouble(1)
      assert(solo === sliced, s"slice $g diverged")
    }
  }

  test("single-class AUC reads NULL; NaN scores drop from ECE instead of crashing") {
    import spark.implicits._
    val onesided = Seq((0.9, 1), (0.8, 1), (0.7, 1)).toDF("s", "y")
    val auc = rows(Eval.aucByRank(onesided, "s", "y")).head
    assert(auc.isNullAt(0), "single-class AUC must be NULL, not NaN")
    val withNan = Seq((0.9, 1), (0.1, 0), (0.5, 1), (0.4, 0),
      (Double.NaN, 1)).toDF("s", "y")
    val e = rows(Eval.ece(withNan, "s", "y", bins = 2)).head
    assert(e.getLong(1) === 4L, "NaN score row must drop from n_rows")
  }

  test("labels outside {0,1} fail loud — a -1/+1 corpus corrupted every metric silently") {
    import spark.implicits._
    // sum(__y) over -1/+1 labels read n_pos = #pos − #neg: AUC/PR/
    // Brier were arbitrarily wrong with no error. Mislabeled data is a
    // caller bug, not a row to quarantine.
    val pm = Seq((0.9, 1), (0.1, -1)).toDF("s", "y")
    val e = intercept[Exception] { rows(Eval.aucByRank(pm, "s", "y")) }
    assert(exMessageChain(e).exists(_.contains("label must be 0/1")),
      s"got: ${e.getMessage}")
    val frac = Seq((0.9, 0.7)).toDF("s", "y") // silently cast to int 0 before
    val e2 = intercept[Exception] { rows(Eval.brier(frac, "s", "y")) }
    assert(exMessageChain(e2).exists(_.contains("label must be 0/1")))
  }

  test("cohensKappa fails fast on mismatched rater column types") {
    import spark.implicits._
    // int 1 renders "1", double 1.0 renders "1.0": two raters in
    // perfect numeric agreement read kappa strongly negative, silently
    val df = Seq((1, 1.0), (0, 0.0)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Eval.cohensKappa(df, "a", "b")
    }
    assert(e.getMessage.contains("must match"))
  }

  private def exMessageChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).toSeq

  test("ece: perfectly calibrated bins score 0; a known gap scores exactly") {
    import spark.implicits._
    // 2 bins of 2: bin means 0.25/0.75, pos rates 0.5/0.5
    // ece = 0.5*|0.5-0.25| + 0.5*|0.5-0.75| = 0.25
    val df = Seq((0.2, 0), (0.3, 1), (0.7, 0), (0.8, 1)).toDF("s", "y")
    val out = rows(Eval.ece(df, "s", "y", bins = 2)).head
    assert(out.getDouble(0) === 0.25 && out.getLong(1) === 4L)
    // identical score/label distribution per bin -> zero gap
    val cal = Seq((0.0, 0), (0.0, 0), (1.0, 1), (1.0, 1)).toDF("s", "y")
    assert(rows(Eval.ece(cal, "s", "y", bins = 2)).head.getDouble(0) === 0.0)
  }

  test("brier: hand-computed MSE, perfect prediction scores 0") {
    import spark.implicits._
    // residuals: (0.8-1)^2 + (0.3-0)^2 = 0.04 + 0.09 -> mean 0.065
    val df = Seq((0.8, 1), (0.3, 0)).toDF("s", "y")
    val out = rows(Eval.brier(df, "s", "y")).head
    assert(out.getDouble(0) === 0.065 && out.getLong(1) === 2L)
    val perfect = Seq((1.0, 1), (0.0, 0)).toDF("s", "y")
    assert(rows(Eval.brier(perfect, "s", "y")).head.getDouble(0) === 0.0)
  }
  test("cohensKappa: perfect, chance-level, and planted-disagreement cases") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("z", "z"))
      .toDF("a", "b")
    val p = rows(Eval.cohensKappa(perfect, "a", "b")).head
    assert(p.getDouble(1) === 1.0 && p.getDouble(3) === 1.0)
    // constant identical raters: p_e = 1 -> kappa undefined (NULL)
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(rows(Eval.cohensKappa(const, "a", "b")).head.isNullAt(3))
    // hand 2x2: cells (x,x)=20 (x,y)=5 (y,x)=10 (y,y)=15, n=50
    // po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val hand = (Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y"))
      ++ Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))).toDF("a", "b")
    val h = rows(Eval.cohensKappa(hand, "a", "b")).head
    assert(h.getLong(0) === 50L)
    assert(h.getDouble(1) === 0.7 && h.getDouble(2) === 0.5)
    assert(h.getDouble(3) === BigDecimal(0.4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("cohensKappa: disjoint label sets read kappa 0, not NULL") {
    import spark.implicits._
    // rater a says only 'cat', rater b only 'dog': the empty marginal
    // join used to NULL p_chance and kappa; correct is p_o=0, p_e=0,
    // kappa = 0 (NULL is reserved for the p_e = 1 constant-raters case)
    val disjoint = Seq(("cat", "dog"), ("cat", "dog")).toDF("a", "b")
    val d = rows(Eval.cohensKappa(disjoint, "a", "b")).head
    assert(d.getDouble(1) === 0.0 && d.getDouble(2) === 0.0)
    assert(!d.isNullAt(3) && d.getDouble(3) === 0.0)
  }

  test("brier/ece: an Infinite score drops from the mean instead of killing the job") {
    import spark.implicits._
    val df = Seq((0.8, 1), (Double.PositiveInfinity, 0), (0.3, 0)).toDF("s", "y")
    // the Inf row's infinite square used to die on the ANSI decimal cast
    val b = rows(Eval.brier(df, "s", "y")).head
    assert(b.getDouble(0) === 0.065 && b.getLong(1) === 2L)
    val e = rows(Eval.ece(df, "s", "y", bins = 2)).head
    assert(e.getAs[Long]("n_rows") === 2L)
  }
}
