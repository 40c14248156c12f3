package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off probe for the q_stream_dropdupwm single-run experiment
  * (r11): runs dropDuplicatesWithinWatermark over the committed
  * fixtures as ONE mtime-pinned AvailableNow run with
  * maxFilesPerTrigger=1 and prints each micro-batch's admitted rows,
  * to split two hypotheses for why the single-run variant lost key
  * 1's post-eviction re-admission (oracle-red 3/4 rows):
  *   (a) the file source did not actually split one file per trigger;
  *   (b) it split correctly but the eviction watermark the dedup
  *       operator sees per batch differs from the restart variant.
  */
object DdwmProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Harness.newSession("8")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val src = "fixtures/stream/stations_dropdup"
    val base = java.nio.file.Files.createTempDirectory("ddwmprobe")
    val drop = java.nio.file.Files.createDirectory(base.resolve("drops"))
    val t0 = 1700000000000L
    new java.io.File(src).listFiles().filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
        val dst = drop.resolve(f.getName)
        java.nio.file.Files.copy(f.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(t0 + i * 2000L))
      }
    val ckpt = base.resolve("ckpt").toString
    val deduped = spark.readStream
      .schema(StructType(Seq(
        StructField("station_id", LongType),
        StructField("last_reported", LongType))))
      .option("maxFilesPerTrigger", 1)
      .json(drop.toString)
      .select(col("station_id"),
        timestamp_seconds(col("last_reported")).as("last_reported"))
      .withWatermark("last_reported", "2 hours")
      .dropDuplicatesWithinWatermark("station_id")
    val q = deduped.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = batch.collect().map(r =>
          s"${r.getLong(0)}@${r.getTimestamp(1)}").mkString(", ")
        println(s"[ddwm-probe] batch=$id admitted=[$rows]")
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(s"[ddwm-probe] lastProgress watermark=" +
      Option(q.lastProgress).map(_.eventTime).orNull)
    spark.stop()
  }
}
