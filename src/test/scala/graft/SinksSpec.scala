package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.model.Schemas.RunContext
import graft.sources.{Sinks, Sources}
import graft.transform.Velib

/** Sink round-trips (SURVEY §2.2): staging CSV overwrite semantics,
  * raw-zone non-replacement, DDL idempotence, partitioned curated write.
  */
class SinksSpec extends SparkTestBase {

  private def curated = Velib.curateStations(Velib.flattenStations(
    Sources.readVelibRaw(spark, s"$FixtureDir/station_status.json")))

  test("K2/S4: staging CSV writes header, overwrite is idempotent, re-read matches") {
    val dir = Files.createTempDirectory("csv").toString + "/stage"
    Sinks.writeCsvOverwrite(curated, dir)
    Sinks.writeCsvOverwrite(curated, dir) // replace=True semantics
    val back = Sources.readCsv(spark, dir, curated.schema)
    assert(back.count() === 6)
    assert(back.schema === curated.schema)
    // inferred-compat fallback also reads it (dtype re-inference path)
    assert(Sources.readCsvInferred(spark, dir).count() === 6)
  }

  test("K2: overwrite REPLACES prior content — no merge, no append, no stale rows") {
    val dir = Files.createTempDirectory("csv").toString + "/stage"
    Sinks.writeCsvOverwrite(curated, dir)
    val subset = curated.filter(col("station_id") === 213688169L)
    Sinks.writeCsvOverwrite(subset, dir)
    val back = Sources.readCsv(spark, dir, curated.schema)
    assert(back.count() === 2) // only the second write's rows survive
    assert(rows(back.select(col("station_id")).distinct())
      .map(_.getLong(0)) === Seq(213688169L))
  }

  test("§2.11: observed load metrics match a recount and the write lands") {
    val dir = Files.createTempDirectory("obs").toString + "/load"
    val m = Sinks.writeParquetObserved(curated, dir, Seq(
      count(lit(1)).as("n_rows"),
      sum(col("num_bikes_available").cast("long")).as("sum_bikes")))
    // the metric rode the write pass; it must equal an explicit recount
    val back = spark.read.parquet(dir)
    assert(m("n_rows") === back.count())
    assert(m("sum_bikes") ===
      rows(back.agg(sum(col("num_bikes_available").cast("long"))))
        .head.getLong(0))
    // raw-zone semantics: the observed writer must not silently re-land
    intercept[org.apache.spark.sql.AnalysisException] {
      Sinks.writeParquetObserved(curated, dir, Seq(count(lit(1)).as("n")))
    }
  }

  test("footerStats answers from metadata, matches the slow path, refuses a silent scan") {
    val dir = Files.createTempDirectory("meta").toString + "/t"
    val df = spark.range(0, 1000).select(
      col("id").as("k"), (col("id") % 7).cast("int").as("grp"),
      concat(lit("name_"), col("id")).as("name"))
    df.repartition(4).write.parquet(dir)
    val r = Sources.footerStats(spark, dir, Seq("k", "grp"))
    assert(r.getLong(0) === 1000L) // n_rows
    assert(r.getLong(1) === 0L && r.getLong(2) === 999L) // min/max k
    assert(r.getInt(3) === 0 && r.getInt(4) === 6) // min/max grp
    // string min/max has no reliable footer stats — Spark declines the
    // push, and the operator must THROW rather than degrade to a scan
    intercept[IllegalArgumentException] {
      Sources.footerStats(spark, dir, Seq("name"))
    }
    // the conf bracket restored session state
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") === "false")
  }

  test("K4: CREATE TABLE IF NOT EXISTS is idempotent and preserves the original schema") {
    Sinks.ensureTable(spark, "t_sink_spec", "id BIGINT, v DOUBLE")
    Sinks.ensureTable(spark, "t_sink_spec", "id BIGINT, v DOUBLE") // no error
    assert(spark.catalog.tableExists("t_sink_spec"))
    // IF NOT EXISTS with a DIFFERENT schema is a no-op, never a silent
    // redefinition: the original column set must survive
    Sinks.ensureTable(spark, "t_sink_spec", "other STRING")
    assert(spark.table("t_sink_spec").schema.fieldNames.toSeq === Seq("id", "v"))
    spark.sql("DROP TABLE t_sink_spec")
  }

  test("curated parquet partitioned write appends and prunes by partition") {
    val dir = Files.createTempDirectory("cur").toString + "/station"
    def run(date: String) = {
      val ctx = RunContext(s"$date 01:00:00", "d", "t")
      Velib.withRunMetadata(curated, ctx)
        .withColumn("ingest_date", col("execution_date").cast("date"))
    }
    Sinks.writeCuratedParquet(run("2024-02-01"), dir, Seq("ingest_date"))
    Sinks.writeCuratedParquet(run("2024-02-02"), dir, Seq("ingest_date")) // append
    // re-running the SAME date must append within that partition, not
    // replace it (the reference's duplicate-fact append semantics)
    Sinks.writeCuratedParquet(run("2024-02-01"), dir, Seq("ingest_date"))
    val back = spark.read.parquet(dir)
    assert(back.count() === 18)
    val pruned = back.filter(col("ingest_date") === "2024-02-01")
    assert(pruned.count() === 12) // only the matching partition's rows
    // the date predicate must prune at the SCAN (directory level) — a
    // post-scan Filter would read every partition at 100 TB
    val ex = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(ex).map(_.group(1)).getOrElse("")
    assert(pf.contains("ingest_date"),
      s"partition filter did not reach the scan:\n$ex")
  }

  test("ORC round-trip preserves schema and rows; partitioned ORC prunes at the scan") {
    val dir = Files.createTempDirectory("orc").toString + "/station"
    val src = curated.withColumn("shard", col("station_id") % 2)
    Sinks.writeOrc(src, dir, Seq("shard"))
    val back = Sources.readOrc(spark, dir)
    assert(back.count() === src.count())
    assert(back.columns.sorted === src.columns.sorted)
    // overwrite replaces (no stale rows from a prior shape)
    Sinks.writeOrc(src.limit(2).withColumn("shard", lit(0L)), dir, Seq("shard"))
    assert(Sources.readOrc(spark, dir).count() === 2)
    // partition pruning reaches the ORC scan exactly as it does parquet
    Sinks.writeOrc(src, dir, Seq("shard"))
    val pruned = Sources.readOrc(spark, dir).filter(col("shard") === 0L)
    val ex = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(ex).map(_.group(1)).getOrElse("")
    assert(pf.contains("shard"),
      s"partition filter did not reach the ORC scan:\n$ex")
  }

  test("gzip raw drops read transparently: same rows as the uncompressed fixture") {
    // Web-scale raw zones land compressed; Hadoop's codec-by-extension
    // makes the SAME schema'd FAILFAST reader handle .json.gz drops —
    // prove it against the committed fixture.
    val dir = Files.createTempDirectory("gz").toString
    val gz = new java.io.File(dir, "station_status.json.gz")
    val in = java.nio.file.Paths.get(s"$FixtureDir/station_status.json")
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gz))
    try out.write(java.nio.file.Files.readAllBytes(in))
    finally out.close()
    val plain = Sources.readVelibRaw(spark, s"$FixtureDir/station_status.json")
    val zipped = Sources.readVelibRaw(spark, gz.getPath)
    assert(zipped.count() === plain.count())
    assert(rows(Velib.curateStations(Velib.flattenStations(zipped))
      .orderBy(col("station_id"), col("last_reported"))) ===
      rows(Velib.curateStations(Velib.flattenStations(plain))
        .orderBy(col("station_id"), col("last_reported"))))
  }

  test("writeRangeSorted: disjoint per-file key ranges, sorted within, nothing lost") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"))
    val dir = Files.createTempDirectory("rs").toString + "/docs"
    Sinks.writeRangeSorted(docs, dir, "doc_id", numFiles = 4)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 2 && files.length <= 4, files.mkString(", "))
    // each file covers a disjoint [min, max] slice of the sort key —
    // the property parquet footer stats turn into file-level skipping
    val ranges = files.map { f =>
      val r = rows(spark.read.parquet(f)
        .agg(min(col("doc_id")), max(col("doc_id")))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"overlapping file ranges: ${ranges.mkString(", ")}")
    }
    // rows are sorted within each file (row-group stats stay monotone)
    val ids = rows(spark.read.parquet(files.head).select(col("doc_id")))
      .map(_.getLong(0))
    assert(ids === ids.sorted)
    // and the layout is a faithful copy
    assert(spark.read.parquet(dir).count() === docs.count())
  }

  test("overwritePartitions replaces only the landed partitions, fully") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dynp").toString + "/t"
    val init = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("c", 20L)).toDF("p", "v")
    Sinks.overwritePartitions(init, dir, Seq("p"))
    // re-land partition a with FEWER, different rows — b and c must
    // survive, and a must hold exactly the new rows (no stale merge)
    Sinks.overwritePartitions(Seq(("a", 99L)).toDF("p", "v"), dir, Seq("p"))
    val got = rows(spark.read.parquet(dir).select(col("p"), col("v"))
      .orderBy(col("p"), col("v"))).map(r => (r.getString(0), r.getLong(1)))
    assert(got === Seq(("a", 99L), ("b", 10L), ("c", 20L)))
  }

  test("readBinaryFiles: whole files arrive as binary rows; glob prunes at listing") {
    val all = rows(graft.sources.Sources
      .readBinaryFiles(spark, "/root/repo/fixtures/media")
      .select(col("path"), col("length"), col("content")))
    assert(all.size === 3)
    all.foreach { r =>
      val onDisk = Files.readAllBytes(
        java.nio.file.Paths.get(new java.net.URI(r.getString(0))))
      assert(r.getLong(1) === onDisk.length.toLong)
      assert(r.getAs[Array[Byte]](2).toSeq === onDisk.toSeq)
    }
    // pathGlobFilter prunes files BEFORE any byte is read
    val clips = rows(graft.sources.Sources
      .readBinaryFiles(spark, "/root/repo/fixtures/media", glob = "clip_*")
      .select(col("path")))
    assert(clips.size === 2)
    assert(clips.forall(_.getString(0).contains("clip_")))
  }

  test("writeShards: one dir per shard, stored in pos order, faithful and re-derivable") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"))
    val dir = Files.createTempDirectory("shards").toString + "/corpus"
    Sinks.writeShards(docs, dir, "doc_id", numShards = 4)
    // every shard directory exists
    val shardDirs = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs === (0 until 4).map(k => s"shard=$k"))
    // stored row order within a shard IS pos order — a sequential
    // reader replays the shuffle with zero sorting (no orderBy here;
    // parquet preserves the written row order per file, and each
    // shard is one task's single sorted run)
    (0 until 4).foreach { k =>
      val pos = rows(spark.read.parquet(s"$dir/shard=$k").select(col("pos")))
        .map(_.getLong(0))
      assert(pos === pos.sorted, s"shard $k not stored in pos order")
      assert(pos === (0L until pos.size.toLong), s"shard $k positions not dense")
    }
    // faithful: the layout holds exactly the corpus, and the stored
    // assignment matches an in-memory re-derivation (pure function of
    // the key set)
    val stored = rows(spark.read.parquet(dir)
      .select(col("doc_id"), col("shard").cast("long"), col("pos"))
      .orderBy(col("doc_id")))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val derived = rows(graft.operators.Sampling.shardedShuffle(docs, "doc_id", 4)
      .select(col("doc_id"), col("shard"), col("pos")).orderBy(col("doc_id")))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stored === derived)
  }

  test("compactParquet collapses a fragmented layout, keeps every row") {
    import spark.implicits._
    val base = Files.createTempDirectory("cmp").toString
    val frag = base + "/frag"
    val out = base + "/out"
    (1L to 5000L).map(i => (i, s"row_$i")).toDF("id", "payload")
      .repartition(40).write.parquet(frag)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag).length === 40)

    val fragBytes = parquetFiles(frag).map(_.length).sum
    val n = graft.sources.Sinks.compactParquet(spark, frag, out,
      targetFileBytes = fragBytes / 4)
    assert(n > 0 && n <= 5, s"expected <=5 files, got $n")
    assert(parquetFiles(out).length === n)

    // value-faithful: same multiset of rows
    val a = rows(spark.read.parquet(frag).orderBy(col("id")))
      .map(r => (r.getLong(0), r.getString(1)))
    val b = rows(spark.read.parquet(out).orderBy(col("id")))
      .map(r => (r.getLong(0), r.getString(1)))
    assert(a === b)

    // degenerate target: everything into one file, no crash
    val one = base + "/one"
    assert(graft.sources.Sinks.compactParquet(spark, frag, one,
      targetFileBytes = Long.MaxValue) === 1)
    assert(parquetFiles(one).length === 1)
  }

  test("writeZOrdered: both dimensions prune at file level; layout faithful") {
    import spark.implicits._
    val base = Files.createTempDirectory("zo").toString
    // 64x64 grid — every (x, y) combination once
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val zDir = base + "/z"
    graft.sources.Sinks.writeZOrdered(grid, zDir, "x", "y", numFiles = 16)

    val files = new java.io.File(zDir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length === 16)

    // faithful copy
    assert(spark.read.parquet(zDir).count() === 4096L)
    val back = rows(spark.read.parquet(zDir).orderBy(col("x"), col("y")))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(back === (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)))

    // per-file footer boxes: a quarter-range query on EACH axis must
    // prune at least half the files (a single-key sort would serve one
    // axis and leave the other touching every file)
    val boxes = files.map { f =>
      val r = rows(spark.read.parquet(f).agg(
        min(col("x")), max(col("x")), min(col("y")), max(col("y")))).head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def touching(lo: Long, hi: Long, axis: String) = boxes.count {
      case (xlo, xhi, ylo, yhi) =>
        if (axis == "x") xhi >= lo && xlo <= hi else yhi >= lo && ylo <= hi
    }
    assert(touching(0, 15, "x") <= 8, boxes.mkString(", "))
    assert(touching(0, 15, "y") <= 8, boxes.mkString(", "))
    assert(touching(48, 63, "x") <= 8, boxes.mkString(", "))
    assert(touching(48, 63, "y") <= 8, boxes.mkString(", "))
  }

  test("readBinaryManifest: bytes identical to the listing route; missing fails fast unless opted out") {
    import spark.implicits._
    import graft.sources.Sources
    val dir = "/root/repo/fixtures/media"
    val listed = Sources.readBinaryFiles(spark, dir, glob = "*.bin")
      .select(col("path"), col("length"), col("content")).collect()
      .map(r => r.getString(0).stripPrefix("file:") ->
        ((r.getLong(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    val manifest = listed.keys.toSeq.sorted.toDF("path")
    val viaManifest = Sources.readBinaryManifest(spark, manifest, "path")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(viaManifest === listed)
    // a manifest naming an absent object is corrupt: fail fast...
    val broken = (listed.keys.toSeq :+ s"$dir/absent.bin").toDF("path")
    intercept[org.apache.spark.SparkException] {
      Sources.readBinaryManifest(spark, broken, "path").count()
    }
    // ...unless the caller explicitly opts into the mid-compaction skip
    val skipped = Sources.readBinaryManifest(
      spark, broken, "path", skipMissing = true)
    assert(skipped.count() === listed.size.toLong)
  }
}
