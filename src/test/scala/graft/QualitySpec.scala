package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    rows(df).map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("checkRows counts false AND null predicate results as violations") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (2L, null), (null, "ok"), (4L, "bad")
    ).toDF("v", "s")
    val m = report(Quality.checkRows(df, Seq(
      Quality.Rule("v_not_null", col("v").isNotNull),
      Quality.Rule("v_small", col("v") < 3), // null v -> null pred -> violation
      Quality.Rule("s_domain", col("s").isin("ok", "meh")))))
    assert(m("v_not_null") === ((1L, 4L)))
    assert(m("v_small") === ((2L, 4L))) // v=4 fails, v=null is a violation too
    assert(m("s_domain") === ((2L, 4L))) // null s and "bad"
  }

  test("checkRows is a single aggregate pass regardless of rule count") {
    val df = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val plan = Quality.checkRows(df, Seq(
      Quality.Rule("r1", col("a") > 0), Quality.Rule("r2", col("b") > 0),
      Quality.Rule("r3", col("a") < col("b"))))
      .queryExecution.executedPlan.toString
    // one aggregate over the scan: no join, no extra scan of the input
    assert(!plan.contains("Join"), plan)
  }

  test("checkUnique counts rows in excess of one per key") {
    val df = Seq((1, "a"), (1, "a"), (1, "a"), (2, "b"), (3, "c"))
      .toDF("k1", "k2")
    val m = report(Quality.checkUnique(df, Seq("k1", "k2"), "pk"))
    assert(m("pk") === ((2L, 5L)))
  }

  test("checkUnique: NULL-keyed rows never conflict (ANSI UNIQUE) but stay in totals") {
    // three rows sharing a NULL key component are LEGAL under
    // ANSI/Postgres UNIQUE (NULLs are all distinct) — a violations===0
    // gate must not fail a load the target warehouse would accept
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (CAST(NULL AS INT), 'a'), (CAST(NULL AS INT), 'a'),
        | (1, CAST(NULL AS STRING)), (1, CAST(NULL AS STRING)),
        | (2, 'b'), (2, 'b')
        |AS t(k1, k2)""".stripMargin)
    val m = report(Quality.checkUnique(df, Seq("k1", "k2"), "pk"))
    // only the fully-non-null (2, 'b') pair duplicates; all 6 rows count
    assert(m("pk") === ((1L, 6L)))
  }

  test("checkRef flags non-null orphans only; null child keys pass") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "x"), (2L, "y"), (99L, "orphan"), (null, "nullkey")
    ).toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val m = report(Quality.checkRef(child, "fk", parent, "pk", "fk_check"))
    assert(m("fk_check") === ((1L, 4L)))
  }

  test("checkRef is robust to duplicate parent keys") {
    val child = Seq(1L, 7L).toDF("fk")
    val parent = Seq(1L, 1L, 1L).toDF("pk")
    val m = report(Quality.checkRef(child, "fk", parent, "pk", "fk"))
    assert(m("fk") === ((1L, 2L))) // duplicates don't inflate totals
  }

  test("report unions checkers and orders by rule name") {
    val df = Seq(1L, 2L).toDF("v")
    val out = rows(Quality.report(
      Quality.checkUnique(df, Seq("v"), "b_rule"),
      Quality.checkRows(df, Seq(Quality.Rule("a_rule", col("v") > 0)))))
    assert(out.map(_.getString(0)) === Seq("a_rule", "b_rule"))
  }
}
