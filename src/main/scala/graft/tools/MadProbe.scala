package graft.tools

import org.apache.spark.sql.functions._

/** One-off component timer for q_profile_mad's cost structure (r10
  * verdict item 3): times the scan, each exact-percentile aggregate
  * (decimal vs double-cast), and the final grouped projection
  * separately, so the remaining cost is attributed by measurement
  * instead of narrative.
  */
object MadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Harness.newSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_extendedprice"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mad-probe] $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"[mad-probe] pass $pass")
      t("scan+count")(df.count())
      val finite = df.filter(!isnan(col("l_extendedprice").cast("double")))
      val med = t("med decimal")(
        finite.agg(percentile(col("l_extendedprice"), lit(0.5)))
          .collect()(0).get(0))
      t("med double")(
        finite.agg(percentile(col("l_extendedprice").cast("double"), lit(0.5)))
          .collect()(0).get(0))
      t("mad decimal")(
        finite.agg(percentile(abs(col("l_extendedprice") - lit(med)), lit(0.5)))
          .collect()(0).get(0))
      t("final agg")(
        df.withColumn("dev", abs(col("l_extendedprice") - lit(med)))
          .groupBy(col("dev") > lit(100.0)).agg(count(lit(1)),
            min(col("l_extendedprice")), max(col("l_extendedprice")))
          .collect())
    }
    spark.stop()
  }
}
