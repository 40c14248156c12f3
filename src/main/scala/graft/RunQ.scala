package graft
import org.apache.spark.sql.SparkSession

/** Single-query profiler: runs one registered query with a noop-sink
  * evaluation, printing elapsed time and the formatted physical plan.
  * Usage: graft.RunQ <queryName> [sfDir] */
object RunQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"ELAPSED=${(System.nanoTime() - t0) / 1e9}%.3f sec")
    spark.stop()
  }
}
