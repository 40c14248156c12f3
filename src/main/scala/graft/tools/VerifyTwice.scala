package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkEntry

/** Nondeterminism smoke: run the FULL query registry twice in one JVM
  * and compare per-query result fingerprints between the runs. The
  * driver's correctness gate runs each query once inside a loaded
  * 276-query process — a query whose result depends on task timing,
  * partition order, or leaked cross-query state (the `q_sink_jdbc`
  * r6 class: an at-least-once load whose flake window only opened
  * under load) can pass an isolated re-run while failing the driver.
  * Two same-process runs widen exactly that window.
  *
  * Fingerprint = md5 over the schema plus the SORTED canonical row
  * strings — order-insensitive (most queries end in orderBy, but ties
  * are allowed to land in any order) and exact on values, so a
  * last-ulp double divergence between runs is a reported finding, not
  * noise to hide.
  *
  * Usage: graft.tools.VerifyTwice [sfDir]   (default sf0.01)
  * Honors SPARK_GRAFT_ONLY like Verify. Exit 1 on any divergence.
  */
object VerifyTwice {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    def fingerprint(df: DataFrame): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(df.schema.treeString.getBytes("UTF-8"))
      df.collect().map(_.toString).sorted
        .foreach(r => md.update((r + "\n").getBytes("UTF-8")))
      md.digest().map("%02x".format(_)).mkString
    }

    def onePass(pass: Int): Map[String, Either[String, String]] =
      names.map { name =>
        System.err.println(s"[verify2] p$pass $name")
        name -> (try Right(fingerprint(SparkEntry.queries(name)(spark, sfDir)))
        catch { case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        })
      }.toMap

    val r1 = onePass(1)
    val r2 = onePass(2)
    var diverged = 0
    names.foreach { n =>
      (r1(n), r2(n)) match {
        case (Right(a), Right(b)) if a == b => ()
        case (Right(a), Right(b)) =>
          diverged += 1
          println(s"DIVERGED $n run1=$a run2=$b")
        case (l, r) =>
          diverged += 1
          println(s"ERRORED $n run1=${l.left.toOption.getOrElse("ok")} " +
            s"run2=${r.left.toOption.getOrElse("ok")}")
      }
    }
    println(s"verify-twice: ${names.size - diverged}/${names.size} stable")
    spark.stop()
    if (diverged > 0) sys.exit(1)
  }
}
