package graft

/** Physical-plan audit over the FULL query registry: exchange counts +
  * join-strategy flags per query, so a shuffle regression or an
  * accidental BroadcastNestedLoopJoin/CartesianProduct is visible at a
  * glance. The target list is DERIVED from `SparkEntry.queries` minus
  * an explicit exclusion map (r9 verdict item 6) — a newly registered
  * query cannot silently skip the audit, and a stale exclusion fails
  * loudly.
  *
  * Reading the output: `veiled` flags a plan whose root is a
  * `Scan ExistingRDD` — iterative operators (PageRank, label
  * propagation, reachability, gap-fill spines) localCheckpoint per
  * round, so the audited plan hides their per-iteration exchanges;
  * their exchange counts read LOW, not wrong, and their physical
  * behavior is asserted in the operator specs. Queries with write
  * side effects (q_sink_*, q_stream_*, ingest) EXECUTE those effects
  * during plan construction, exactly as they do under Verify — the
  * audit sweep costs roughly one Verify pass.
  *
  * Honors SPARK_GRAFT_ONLY for subset iteration. Exit 1 on any
  * audit error (a query whose plan cannot even be constructed).
  */
object PlanAudit {

  /** Excluded queries, each with its reason — keep this list justified
    * and SHORT; anything not listed here is audited.
    */
  val exclusions: Map[String, String] = Map(
    "q_load_metrics" -> ("driver-local metric rows (LocalTableScan " +
      "wrapper over the JDBC load's outcome); auditing would print the " +
      "wrapper's plan, not the real write, while executing the load as " +
      "a side effect — physical behavior asserted in SinksSpec/JdbcSpec"),
    "q_meta_stats" -> ("footer-stats LocalTableScan wrapper (driver " +
      "reads parquet footers, no Spark scan at all); asserted in " +
      "SinksSpec — the audited plan would be an empty shell"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    val stale = exclusions.keySet.diff(SparkEntry.queries.keySet)
    require(stale.isEmpty,
      s"stale PlanAudit exclusions (not in the registry): ${stale.mkString(", ")}")

    val targets = Harness.selectedNames("planaudit")
      .filterNot(exclusions.contains)
    var errs = 0
    targets.grouped(Harness.RecycleEvery).foreach { chunk =>
      // the ONE session recipe (Harness.newSession) — a hand-inlined
      // builder here had already drifted (log level, hardcoded core
      // count) and would silently miss any future plan-affecting conf,
      // making the audited exchange counts reflect plans the verified
      // mains never run. Recycled like Bench/VerifyTwice: a 276-query
      // sweep in one session hits the ThreadLocal degradation.
      val spark = Harness.newSession(cpus)
      chunk.foreach { n =>
        try {
          val plan = SparkEntry.queries(n)(spark, dir)
            .queryExecution.executedPlan.toString
          val ex = "Exchange".r.findAllIn(plan).size
          val flags = Seq(
            "BNLJ" -> plan.contains("BroadcastNestedLoopJoin"),
            "cartesian" -> plan.contains("CartesianProduct"),
            "bcast" -> plan.contains("BroadcastHashJoin"),
            "window" -> plan.contains("Window"),
            "veiled" -> plan.contains("ExistingRDD")).collect { case (k, true) => k }
          println(f"$n%-26s exchanges=$ex%-3d ${flags.mkString(",")}")
        } catch { case e: Throwable =>
          errs += 1
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replace('\n', ' ').take(160)
          println(f"$n%-26s AUDIT-ERR $msg")
        }
      }
      Harness.recycle(spark)
    }
    println(s"[planaudit] audited=${targets.size} " +
      s"excluded=${exclusions.size} errors=$errs")
    if (errs > 0) sys.exit(1)
  }
}
