package graft.tools

/** One-off calibration helper: runs graft.Bench's host-speed probe
  * shape repeatedly on the current host and prints the timings, so
  * the quiet-host reference constant in [[graft.Bench]] can be set
  * from measured data rather than a guess.
  */
object ProbeCal {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    (1 to 3).foreach { s =>
      val spark = graft.Harness.newSession(cpus)
      val t = graft.Bench.hostSpeedProbe(spark)
      val io = graft.Bench.hostIoProbe(spark)
      graft.Harness.recycle(spark)
      println(f"[probe-cal] session $s: cpu $t%.3f s  io $io%.3f s")
    }
  }
}
