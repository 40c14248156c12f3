package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink writers mirroring the reference's raw/staging/warehouse zones
  * (SURVEY.md §2.2).
  */
object Sinks {

  /** Raw-zone JSON: non-replacing, like the reference's S3 upload without
    * `replace` (`airflow/dags/etl_dag.py:51-55`) — a re-run against the
    * same key fails rather than silently overwriting raw history.
    */
  def writeRawJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.ErrorIfExists).json(path)

  /** Staging-zone CSV: header + overwrite, mirroring `replace=True`
    * (`etl_dag.py:106-112`) which is what makes the reference's
    * transform task idempotent.
    */
  def writeCsvOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Load with OBSERVED metrics — the reference's rows-loaded metric
    * push (`s3_to_postgres.py:84-86` counts the frame and XComs the
    * number to downstream tasks; SURVEY §2.11 maps XCom metrics to the
    * `observe` API). The named metric expressions ride the ONE write
    * pass as accumulator-backed observations and come back as a
    * driver-side map — where the reference pays a second scan to
    * count, this costs nothing extra, which is the difference between
    * "free telemetry" and "double the job" at 100 TB. Metrics must be
    * aggregate expressions the observation framework accepts (no
    * distinct, no sort-dependent aggregates).
    */
  def writeParquetObserved(
      df: DataFrame, path: String,
      metrics: Seq[org.apache.spark.sql.Column]): Map[String, Any] = {
    require(metrics.nonEmpty, "writeParquetObserved needs at least one metric")
    val obs = new org.apache.spark.sql.Observation(
      s"load_${java.util.UUID.randomUUID()}")
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode(SaveMode.ErrorIfExists).parquet(path)
    obs.get
  }

  /** Curated-zone parquet partitioned by ingest date — replaces the
    * reference's timestamped flat S3 keys (`etl_dag.py:46`) with a
    * partition layout Catalyst can prune (SURVEY.md §4.2).
    */
  def writeCuratedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Columnar ORC write (overwrite, optionally partitioned) — same
    * curated-zone layout contract as [[writeCuratedParquet]] for
    * deployments whose lake standard is ORC.
    */
  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  /** Range-partitioned, range-SORTED parquet layout (overwrite): rows
    * are range-partitioned into `numFiles` contiguous key ranges and
    * sorted within each, so every output file covers a disjoint
    * [min, max] slice of `sortCol`. Parquet's footer/row-group
    * statistics then let any range or point predicate on that column
    * skip whole files and row groups at scan time — the sort-based
    * data-skipping complement to [[writeBucketedTable]]'s hash
    * clustering (range scans prune here; equi-joins co-locate there).
    * The range exchange samples the key distribution, so skewed keys
    * still yield balanced files.
    */
  def writeRangeSorted(
      df: DataFrame, path: String, sortCol: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Dynamic partition overwrite — the incremental-ETL staple: replace
    * ONLY the partitions the batch actually contains, leaving every
    * other partition untouched (static overwrite mode would truncate
    * the whole table first — the classic full-table-wipe accident).
    * The idempotent re-land primitive for partitioned lakehouse
    * tables: re-running a day's batch rewrites that day's partitions
    * and nothing else.
    *
    * The mode rides as a per-WRITE option, not a session conf — no
    * shared mutable state (the nanosAsLong lesson), and concurrent
    * writers with different semantics don't fight.
    */
  def overwritePartitions(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty,
      "overwritePartitions needs at least one partition column")
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Training-shard layout: materialize
    * [[graft.operators.Sampling.shardedShuffle]]'s deterministic
    * global permutation as one directory per shard
    * (`shard=<k>/part-*.parquet`), rows inside each shard's files
    * stored in `pos` order — so a trainer streaming shard k
    * sequentially (or all shards round-robin by `global_pos`) replays
    * the exact shuffled order with zero read-time sorting.
    *
    * One exchange total: the hash repartition on `shard` feeds both
    * the within-shard sort and the partitioned write. Each SHARD is
    * wholly inside one task (so every shard directory is one sorted
    * run), but the mapping is murmur3(shard) % numShards, not
    * identity — hash collisions make some tasks carry 2+ shards and
    * leave ~1/e of tasks empty at small shard counts, so write
    * parallelism degrades by a small constant factor. Contents and
    * ordering are unaffected; callers needing balanced write tasks
    * should over-provision shuffle partitions, not assume task k =
    * shard k.
    */
  def writeShards(
      df: DataFrame, path: String, keyCol: String, numShards: Int): Unit = {
    val sharded = graft.operators.Sampling.shardedShuffle(df, keyCol, numShards)
    sharded
      .repartition(numShards, org.apache.spark.sql.functions.col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Z-order (Morton curve) layout: cluster rows so BOTH of two keys
    * get file-level data skipping — the 2D complement to
    * [[writeRangeSorted]] (which serves one key perfectly and the
    * other not at all). Each key is min/max-scaled to a 16-bit rank,
    * the ranks' bits are interleaved into a 32-bit Morton code, and
    * the frame is range-partitioned + sorted by that code: contiguous
    * curve segments are spatially local, so every file's (minA, maxA,
    * minB, maxB) footer box is tight and a 2D range predicate prunes
    * most files on stats alone.
    *
    * The min/max scan is one tiny aggregate collected to the driver —
    * four scalars, the broadcast-model idiom. Bit-spreading is the
    * classic mask-shift chain (5 ops per key), pure codegen'd integer
    * arithmetic. Skew caveat: min/max scaling degrades under extreme
    * outliers (one huge value compresses everyone else's ranks);
    * a rank-based variant (percent_rank) is the remedy — documented,
    * not needed for the harness distributions.
    */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(!df.columns.contains("__z"),
      "input already has a column named __z (reserved)")
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    // bounds over FINITE values only: max() returns NaN for a
    // NaN-bearing double column (NaN orders largest), which poisons
    // the scale to NaN and floor(NaN).cast(long) SILENTLY collapses
    // every row's rank to 0 — and ±Infinity does the same one step
    // later (maxA = Inf makes the scale factor 0.0, ranking every
    // finite row 0; -Inf poisons lo symmetrically). Either way the
    // write "succeeds" with the promised 2D clustering gone on that
    // dimension.
    def finiteOnly(c: Column) = {
      val d = c.cast("double")
      when(!isnan(d) && abs(d) < Double.PositiveInfinity, c)
    }
    val Seq(minA, maxA, minB, maxB) =
      df.agg(
          min(finiteOnly(col(colA))).cast("double"),
          max(finiteOnly(col(colA))).cast("double"),
          min(finiteOnly(col(colB))).cast("double"),
          max(finiteOnly(col(colB))).cast("double"))
        .head().toSeq.map(_.asInstanceOf[Double])

    def rank16(c: Column, lo: Double, hi: Double): Column =
      if (hi == lo) lit(0L)
      // non-finite rows take explicit edge ranks (NaN/-Inf low, +Inf
      // high): they cluster at one end and keep the other dimension's
      // clustering intact — and floor(Inf).cast(long) would otherwise
      // ANSI-abort the write the bounds exclusion just saved
      else {
        val d = c.cast("double")
        when(isnan(d) || d === Double.NegativeInfinity, lit(0L))
          .when(d === Double.PositiveInfinity, lit(65535L))
          .otherwise(
            least(lit(65535L), greatest(lit(0L),
              floor((d - lit(lo)) * lit(65535.0 / (hi - lo))).cast("long"))))
      }

    // spread the low 16 bits of x to the even bit positions of a long
    def spread(x: Column): Column = {
      val s1 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    val morton = spread(rank16(col(colA), minA, maxA))
      .bitwiseOR(shiftleft(spread(rank16(col(colB), minB, maxB)), 1))

    df.withColumn("__z", morton)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileBytes` files. The small-files problem is THE silent
    * scale killer of append-heavy layouts (every micro-batch / every
    * incremental load drops a few files; a year later the table is a
    * million 100 KB files and planning+open() dominates every scan).
    *
    * Output file count is sized from the CURRENT on-disk bytes (one FS
    * listing, no data scan) — compression ratios carry over since the
    * rewrite keeps the same format. `coalesce` merges partitions
    * WITHOUT a shuffle: each output task concatenates whole input
    * splits, so the rewrite is pure I/O. (A `repartition` would both
    * shuffle everything and destroy any within-file sort order.)
    *
    * Returns the number of files written. Writes to a NEW directory —
    * swap-in is the caller's atomic-rename/pointer concern (see
    * `Streams.streamingLatestMerge` for the pointer pattern).
    */
  def compactParquet(
      spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive")
    import org.apache.hadoop.fs.Path
    val p = new Path(inDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // Same/nested target is IRREVERSIBLE data loss: mode(Overwrite)
    // deletes outDir's contents BEFORE the read job runs, and Spark's
    // read-path overwrite guard covers only the InsertIntoStatement
    // path, not DataFrameWriter.save() — a same-directory compaction
    // would destroy the only copy of the table. Refuse it on the
    // QUALIFIED paths.
    val qIn = fs.makeQualified(p).toString.stripSuffix("/") + "/"
    val qOut = fs.makeQualified(new Path(outDir)).toString.stripSuffix("/") + "/"
    require(!qIn.startsWith(qOut) && !qOut.startsWith(qIn),
      s"outDir must be disjoint from inDir (got in=$qIn out=$qOut): " +
        "overwrite deletes the target before the read job runs")
    // a hive-partitioned layout would be read WITH partition inference
    // and written back FLAT — every later partition-pruned scan of the
    // compacted copy silently degrades to a full read. Refuse it:
    // compact each partition directory separately (the layout the doc
    // targets is append-heavy small files WITHIN one directory).
    val partitioned = fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.contains("="))
    require(!partitioned,
      s"$inDir contains hive partition directories — compacting would " +
        "flatten the layout and lose partition pruning; compact each " +
        "partition directory separately")
    val it = fs.listFiles(p, true)
    var totalBytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) totalBytes += f.getLen
    }
    require(totalBytes > 0,
      s"no parquet data under $inDir — nothing to compact " +
        "(an empty read would fail schema inference with a confusing error)")
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    // The scan's split planning may already pack the small files into
    // fewer partitions than the byte-derived target — coalesce can only
    // lower the count, so the actual output size is the min of the two.
    val coalesced = spark.read.parquet(inDir).coalesce(nFiles)
    val actual = coalesced.rdd.getNumPartitions
    coalesced.write.mode(SaveMode.Overwrite).parquet(outDir)
    actual
  }

  /** Idempotent DDL (`etl_dag.py:116-139`, `:266-280`): CREATE TABLE IF
    * NOT EXISTS against the session catalog, parquet-backed.
    */
  def ensureTable(spark: SparkSession, table: String, ddlColumns: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table ($ddlColumns) USING parquet")

  /** Bucketed warehouse table (the co-located-join path of the 100 TB
    * playbook): rows are hash-clustered into `buckets` files per
    * partition by `keyCol` at WRITE time, so an equi-join or aggregation
    * on that key later runs with NO exchange — the dominant shuffle of
    * a fact-to-fact join is paid once, at load, instead of per query.
    * `sortCol` additionally sorts within each bucket, letting a
    * sort-merge join skip its sort. Requires `saveAsTable` (bucket
    * metadata lives in the catalog, not the files).
    */
  def writeBucketedTable(
      df: DataFrame, table: String, buckets: Int, keyCol: String,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, keyCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** Warehouse append (`airflow/plugins/s3_to_postgres.py:76-82`):
    * by-name column alignment, then a batched JDBC append — replacing the
    * reference's one-INSERT-per-row loop with executor-parallel batched
    * writes. Exercised offline against an embedded Derby warehouse
    * (`q_sink_jdbc`, JdbcSpec) — the url decides the backend, so the
    * same call lands in Postgres on a real deployment.
    */
  def jdbcAppend(
      df: DataFrame, url: String, table: String,
      targetFields: Seq[String], props: java.util.Properties): Unit =
    df.select(targetFields.head, targetFields.tail: _*)
      .write.mode(SaveMode.Append)
      .option("batchsize", 10000)
      .jdbc(url, table, props)

  /** Exactly-once JDBC load — the idempotence upgrade over
    * [[jdbcAppend]] and over the reference's per-row INSERT loop
    * (`airflow/plugins/s3_to_postgres.py:76-82`), which double-inserts
    * whenever a retry follows a partial failure — the documented flaw
    * SURVEY §7.4-3 says the engine must fix. Every task lands its
    * slice as ONE transaction of delete-then-insert keyed on
    * (`load_batch_id`, `load_part_id`):
    *
    *   - a task retry — including retry-after-commit, where the
    *     executor died after COMMIT but before reporting success, the
    *     window a plain per-partition append cannot survive — first
    *     deletes the rows its previous attempt landed, so re-landing
    *     is exact, not additive;
    *   - CONCURRENT duplicate attempts (speculative execution, a
    *     zombie task on a presumed-dead executor) serialize: the
    *     transaction runs SERIALIZABLE, so the later attempt's DELETE
    *     waits on (or conflicts with) the earlier's still-open
    *     transaction instead of reading an empty slice under
    *     READ_COMMITTED and double-landing; whichever commits last
    *     has deleted the other's rows first, leaving exactly one
    *     copy. (An SSI engine like Postgres aborts one attempt
    *     instead — Spark retries it, same fixed point.)
    *   - replaying the WHOLE load with the same `batchId` nets a
    *     no-op; the driver additionally clears this batch's parts at
    *     or beyond the current partition count, so a replay under a
    *     coarser partitioning leaves no stale high-numbered slices.
    *
    * Requirements: the target table carries `load_batch_id
    * VARCHAR` + `load_part_id INT` bookkeeping columns (readers
    * project them out — index them so serializable range locks stay
    * narrow instead of escalating to table locks), and the input's
    * partitions are deterministic under recompute — true for scans
    * plus narrow transforms and for fixed-key shuffles, the standard
    * Spark retry assumption. Batched statements (10k) keep the write
    * executor-parallel like [[jdbcAppend]]; one transaction per
    * partition means partitions should be sized to the database's
    * transaction budget (repartition upstream for very large loads).
    */
  def jdbcIdempotentLoad(
      df: DataFrame, url: String, table: String,
      targetFields: Seq[String], batchId: String,
      props: java.util.Properties): Unit = {
    val sel = df.select(targetFields.head, targetFields.tail: _*)
    val sqlTypes = sel.schema.fields.map(f => jdbcTypeOf(f.dataType))
    val nFields = targetFields.size
    val rdd = sel.rdd
    val nParts = rdd.getNumPartitions
    val c0 = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = c0.prepareStatement(
        s"DELETE FROM $table WHERE load_batch_id = ? AND load_part_id >= ?")
      st.setString(1, batchId); st.setInt(2, nParts)
      st.executeUpdate(); st.close()
    } finally c0.close()
    val insertSql =
      s"INSERT INTO $table (${targetFields.mkString(", ")}," +
        s" load_batch_id, load_part_id)" +
        s" VALUES (${Seq.fill(nFields + 2)("?").mkString(", ")})"
    rdd.foreachPartition { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        // SERIALIZABLE: concurrent duplicate attempts for the same
        // (batch, part) must contend on the slice's key range — under
        // READ_COMMITTED a second attempt's DELETE sees none of the
        // first's uncommitted rows, both insert, both commit = two
        // copies (the speculation/zombie window)
        conn.setTransactionIsolation(
          java.sql.Connection.TRANSACTION_SERIALIZABLE)
        val del = conn.prepareStatement(
          s"DELETE FROM $table WHERE load_batch_id = ? AND load_part_id = ?")
        del.setString(1, batchId); del.setInt(2, pid)
        del.executeUpdate(); del.close()
        val ins = conn.prepareStatement(insertSql)
        var n = 0
        rows.foreach { r =>
          var i = 0
          while (i < nFields) {
            val v = r.get(i)
            if (v == null) ins.setNull(i + 1, sqlTypes(i))
            else ins.setObject(i + 1, v)
            i += 1
          }
          ins.setString(nFields + 1, batchId)
          ins.setInt(nFields + 2, pid)
          ins.addBatch()
          n += 1
          if (n % 10000 == 0) ins.executeBatch()
        }
        ins.executeBatch(); ins.close()
        conn.commit()
      } catch {
        case t: Throwable =>
          try conn.rollback()
          catch { case _: java.sql.SQLException => () }
          throw t
      } finally conn.close()
    }
  }

  /** External-row-type → java.sql.Types mapping for setNull (Derby and
    * Postgres both reject an untyped NULL parameter). Non-null values
    * go through setObject, whose external types (java.math.BigDecimal,
    * java.sql.Timestamp/Date) every JDBC driver maps natively.
    */
  private def jdbcTypeOf(dt: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.types._
    import java.sql.Types
    dt match {
      case LongType => Types.BIGINT
      case IntegerType => Types.INTEGER
      case ShortType => Types.SMALLINT
      case ByteType => Types.TINYINT
      case DoubleType => Types.DOUBLE
      case FloatType => Types.REAL
      case BooleanType => Types.BOOLEAN
      case StringType => Types.VARCHAR
      case _: DecimalType => Types.DECIMAL
      case TimestampType => Types.TIMESTAMP
      case DateType => Types.DATE
      case BinaryType => Types.VARBINARY
      case other => throw new IllegalArgumentException(
        s"jdbcIdempotentLoad: unsupported column type $other " +
          "(cast to a JDBC-representable type upstream)")
    }
  }
}
