package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkTestBase {

  private def li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")

  private val groups = Seq("l_returnflag", "l_linestatus")

  private def canon(df: DataFrame): Seq[(String, String, Double, Long, Double, Double, Double)] =
    rows(IncrementalAgg.finish(df)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_v").cast("double"), col("n_v"), col("min_v"), col("max_v"),
        col("avg_v"))
      .orderBy(col("l_returnflag"), col("l_linestatus")))
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))

  test("merge of split states equals full recompute exactly") {
    val cut = lit("1997-06-01").cast("date")
    val merged = IncrementalAgg.mergeState(
      IncrementalAgg.buildState(
        li.filter(col("l_shipdate") < cut), groups, "l_extendedprice"),
      IncrementalAgg.buildState(
        li.filter(col("l_shipdate") >= cut), groups, "l_extendedprice"))
    val full = IncrementalAgg.buildState(li, groups, "l_extendedprice")
    assert(canon(merged) === canon(full))
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val a = IncrementalAgg.buildState(
      li.filter(col("l_orderkey") % 3 === 0), groups, "l_extendedprice")
    val b = IncrementalAgg.buildState(
      li.filter(col("l_orderkey") % 3 === 1), groups, "l_extendedprice")
    val c = IncrementalAgg.buildState(
      li.filter(col("l_orderkey") % 3 === 2), groups, "l_extendedprice")
    val left = IncrementalAgg.mergeState(IncrementalAgg.mergeState(a, b), c)
    val right = IncrementalAgg.mergeState(a, IncrementalAgg.mergeState(b, c))
    assert(canon(left) === canon(right))
    assert(canon(left) === canon(
      IncrementalAgg.buildState(li, groups, "l_extendedprice")))
  }

  test("empty-side merge is the identity") {
    val full = IncrementalAgg.buildState(li, groups, "l_extendedprice")
    val empty = IncrementalAgg.buildState(
      li.filter(lit(false)), groups, "l_extendedprice")
    assert(canon(IncrementalAgg.mergeState(full, empty)) === canon(full))
  }

  test("null values stay out of every measure consistently") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", null), ("a", 3.0), ("b", null))
      .toDF("k", "v")
    val out = rows(IncrementalAgg.finish(
      IncrementalAgg.buildState(df, Seq("k"), "v")).orderBy(col("k")))
    // group "a": sum 4.0 over n=2; group "b": all-null -> n=0, null measures
    assert(out.map(_.getString(0)) === Seq("a", "b"))
    val a = out.head
    assert(a.getDecimal(1).doubleValue() === 4.0 && a.getLong(2) === 2L &&
      a.getDouble(5) === 2.0)
    val b = out(1)
    assert(b.isNullAt(1) && b.getLong(2) === 0L && b.isNullAt(3) && b.isNullAt(5))
  }

  test("NaN/Inf/over-magnitude values cost their row, never the state build") {
    import spark.implicits._
    // cast(NaN AS DECIMAL(28,2)) ANSI-kills the job unguarded; the
    // all-NULL group must still emit its state row (n=0), not vanish
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", Double.NaN), ("a", 3.0),
      ("a", Double.PositiveInfinity), ("a", 1e27),
      ("b", null)).toDF("k", "v")
    val out = rows(IncrementalAgg.finish(
      IncrementalAgg.buildState(df, Seq("k"), "v")).orderBy(col("k")))
    assert(out.map(_.getString(0)) === Seq("a", "b"))
    assert(out.head.getDecimal(1).doubleValue() === 4.0 &&
      out.head.getLong(2) === 2L)
    assert(out(1).getLong(2) === 0L, "all-null group keeps its state row")
  }

  test("joinDelta: old view + delta equals the full recompute for any split") {
    import spark.implicits._
    val aAll = (1L to 40L).map(i => (i % 12, s"a$i")).toDF("k", "av")
    val bAll = (1L to 60L).map(i => (i % 12, s"b$i")).toDF("k", "bv")
    for (seed <- 1 to 3) {
      val r2 = new scala.util.Random(seed)
      val aCut = r2.nextInt(12).toLong
      val bCut = r2.nextInt(12).toLong
      val (aOld, aDelta) = (aAll.filter(col("k") < aCut), aAll.filter(col("k") >= aCut))
      val (bOld, bDelta) = (bAll.filter(col("k") < bCut), bAll.filter(col("k") >= bCut))
      val maintained = aOld.join(bOld, "k").unionByName(
        IncrementalAgg.joinDelta(aOld, aDelta, bOld, bDelta, "k"))
      val full = aAll.join(bAll, "k")
      def canon(df: org.apache.spark.sql.DataFrame) =
        rows(df.orderBy(col("k"), col("av"), col("bv")))
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(canon(maintained) === canon(full), s"split seed $seed diverged")
    }
  }

  test("retractState: sums/counts subtract exactly; rebuild flags only touched extremes") {
    import spark.implicits._
    val base = Seq(
      ("a", 1.0), ("a", 5.0), ("a", 9.0),
      ("b", 2.0), ("b", 4.0)).toDF("k", "v")
    val st = IncrementalAgg.buildState(base, Seq("k"), "v")
    // delete a mid value from a (extremes intact), and b's max.
    val deletes = Seq(("a", 5.0), ("b", 4.0)).toDF("k", "v")
    val out = rows(IncrementalAgg.retractState(st, deletes, Seq("k"), "v")
      .orderBy(col("k")))
      .map(r => (r.getString(0), r.getDecimal(1).doubleValue(), r.getLong(2),
        r.getBoolean(5)))
    assert(out === Seq(("a", 10.0, 2L, false), ("b", 2.0, 1L, true)))
  }

  test("retractState: a group with no deletes passes through unflagged and unchanged") {
    import spark.implicits._
    val base = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val st = IncrementalAgg.buildState(base, Seq("k"), "v")
    val deletes = Seq(("a", 1.0)).toDF("k", "v")
    val out = rows(IncrementalAgg.retractState(st, deletes, Seq("k"), "v")
      .orderBy(col("k")))
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(5)))
    assert(out === Seq(("a", 0L, true), ("b", 1L, false)))
  }

  test("retractState: a fully-deleted group nulls its extremes (not stale carry)") {
    import spark.implicits._
    val base = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0)).toDF("k", "v")
    val st = IncrementalAgg.buildState(base, Seq("k"), "v")
    val deletes = Seq(("a", 1.0), ("a", 3.0)).toDF("k", "v")
    val out = rows(IncrementalAgg.retractState(st, deletes, Seq("k"), "v")
      .orderBy(col("k")))
    val a = out.head
    assert(a.getString(0) === "a" && a.getLong(2) === 0L)
    assert(a.isNullAt(3) && a.isNullAt(4), s"extremes must be null: $a")
    assert(a.getBoolean(5)) // empty rebuild slice erases the group
    val b = out(1)
    assert(b.getString(0) === "b" && !b.isNullAt(3) && !b.getBoolean(5))
  }

  test("retractState/mergeState reject derived-state shapes instead of corrupting") {
    import spark.implicits._
    val base = Seq(("g1", 1.0), ("g1", 5.0)).toDF("g", "v")
    val st = IncrementalAgg.buildState(base, Seq("g"), "v")
    val deletes = Seq(("g1", 5.0)).toDF("g", "v")
    val once = IncrementalAgg.retractState(st, deletes, Seq("g"), "v")
    // chaining a second retract on an unrebuilt flagged state used to
    // silently CLEAR needs_rebuild against the stale extremes
    val e1 = intercept[IllegalArgumentException] {
      IncrementalAgg.retractState(once, deletes, Seq("g"), "v")
    }
    assert(e1.getMessage.contains("needs_rebuild"))
    // merging retractState output would infer needs_rebuild as a
    // GROUP KEY and emit two rows for one real group
    val e2 = intercept[IllegalArgumentException] {
      IncrementalAgg.mergeState(once, once)
    }
    assert(e2.getMessage.contains("needs_rebuild"))
  }

  test("joinDelta fails fast on overlapping non-key columns or schema drift") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "y")).toDF("k", "v") // clashing value column name
    intercept[IllegalArgumentException] {
      IncrementalAgg.joinDelta(a, a, b, b, "k")
    }
    val b2 = Seq((1L, "y")).toDF("k", "bv")
    intercept[IllegalArgumentException] {
      IncrementalAgg.joinDelta(a, a.withColumnRenamed("v", "v2"), b2, b2, "k")
    }
  }
}
