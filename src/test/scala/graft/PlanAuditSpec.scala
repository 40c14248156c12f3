package graft

import org.apache.spark.sql.functions._

/** PlanAudit's BNLJ build-side boundedness judgment (r11 verdict
  * item 3): "zero BNLJ" drifted into the r10 record because the audit
  * only FLAGGED the join strategy — it carried no judgment of whether
  * the broadcast build side was a bounded O(k) subtree or an
  * accidental O(data) broadcast. These tests pin the classifier red
  * on a synthetic unbounded BNLJ (build side scans a data table) and
  * green on every deliberate bounded shape the registry uses.
  */
class PlanAuditSpec extends SparkTestBase {

  private val Sf = "/root/testdata/sf0.001"

  private def audit(df: org.apache.spark.sql.DataFrame): Seq[String] =
    PlanAudit.unboundedBnljs(df.queryExecution.executedPlan)

  test("unbounded BNLJ (broadcast build side scans a data table) is RED") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey"))
    val ord = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderkey"))
    // non-equi condition forces BNLJ; the broadcast side is a raw
    // table scan — exactly the accidental shape that must fail the
    // audit however small the table happens to be at test SF
    val bad = li.join(broadcast(ord), col("l_orderkey") > col("o_orderkey"))
    val plan = bad.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(audit(bad).nonEmpty,
      s"data-table broadcast build side passed the boundedness audit:\n$plan")
  }

  test("bounded BNLJ shapes are GREEN: global-agg build, literal spine, limit") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    // 1-row global aggregate broadcast — the registry's 23-site
    // crossJoin(broadcast(<scalar agg>)) scalar-attach shape
    val agg = li.crossJoin(broadcast(
      li.agg(sum(col("l_quantity")).as("total"))))
    // literal Range spine broadcast
    val spine = li.crossJoin(broadcast(
      spark.range(5).select(col("id").as("bucket"))))
    // limit-bounded broadcast
    val lim = li.crossJoin(broadcast(
      spark.read.parquet(s"$Sf/orders.parquet").limit(3)))
    Seq("agg" -> agg, "spine" -> spine, "limit" -> lim).foreach {
      case (name, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastNestedLoopJoin"), s"$name: $plan")
        assert(audit(df).isEmpty,
          s"bounded '$name' build side flagged unbounded:\n$plan")
    }
  }

  test("boundedness composes: projection/filter over a global agg stays bounded; join of scans stays unbounded") {
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val composed = li.crossJoin(broadcast(
      li.agg(sum(col("l_quantity")).as("t"))
        .select((col("t") * 2).as("t2")).filter(col("t2") > 0)))
    assert(audit(composed).isEmpty)
    val ord = spark.read.parquet(s"$Sf/orders.parquet")
    val joined = li.select(col("l_orderkey")).join(
      broadcast(ord.select(col("o_orderkey"))
        .join(spark.read.parquet(s"$Sf/customer.parquet")
          .select(col("c_custkey")),
          col("o_orderkey") === col("c_custkey"))),
      col("l_orderkey") > col("o_orderkey"))
    if (joined.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(audit(joined).nonEmpty,
        "join-of-scans broadcast build side passed the audit")
  }
}
