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
}
