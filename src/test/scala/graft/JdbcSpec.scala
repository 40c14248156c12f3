package graft

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Sources}
import graft.queries.QueryUtil

/** JDBC warehouse hop (SURVEY §2.1 S7 scan + §2.2 K3 batched append),
  * exercised against an embedded Derby database — the RDBMS the Spark
  * distribution itself ships (for its metastore), so the reference's
  * Postgres terminal hop (`s3_to_postgres.py:76-82`) runs for real,
  * offline. The url decides the backend; nothing here is
  * Derby-specific except the DDL dialect in the fixture setup.
  */
class JdbcSpec extends SparkTestBase {

  private def freshDb(): (String, java.util.Properties) = {
    val home = QueryUtil.scratchDir("graft_jdbct_")
    System.setProperty("derby.system.home", home)
    (s"jdbc:derby:$home/db;create=true", new java.util.Properties())
  }

  private def createTable(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE t_load (k BIGINT, name VARCHAR(64), grp INT," +
        " bal DECIMAL(12,2))")
    finally conn.close()
  }

  private def sample = {
    import spark.implicits._
    Seq(
      (1L, "alpha", 1, BigDecimal("10.50")),
      (2L, "beta", 2, BigDecimal("-3.25")),
      (3L, "gamma", 1, BigDecimal("7.00")),
      (4L, "delta", 3, BigDecimal("0.00")))
      .toDF("k", "name", "grp", "bal")
      .select(col("k"), col("name"), col("grp"),
        col("bal").cast("decimal(12,2)").as("bal"))
  }

  test("K3: batched append lands rows bit-for-bit and append APPENDS") {
    val (url, props) = freshDb()
    createTable(url)
    Sinks.jdbcAppend(sample, url, "t_load",
      Seq("k", "name", "grp", "bal"), props)
    val once = Sources.readJdbc(spark, url, "t_load", "k", 0L, 100L, 2, props)
    // Derby surfaces uppercase identifiers; values must be exact
    assert(once.count() === 4)
    val got = rows(once.orderBy(col("K")))
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getDecimal(3).toPlainString))
    assert(got === Seq(
      (1L, "alpha", 1, "10.50"), (2L, "beta", 2, "-3.25"),
      (3L, "gamma", 1, "7.00"), (4L, "delta", 3, "0.00")))
    // second land of a subset must ADD, not replace
    Sinks.jdbcAppend(sample.filter(col("grp") === 1), url, "t_load",
      Seq("k", "name", "grp", "bal"), props)
    val twice = Sources.readJdbc(spark, url, "t_load", "k", 0L, 100L, 2, props)
    assert(twice.count() === 6)
    assert(rows(twice.groupBy(col("GRP")).agg(count(lit(1)).as("n"))
      .orderBy(col("GRP"))).map(r => (r.getInt(0), r.getLong(1)))
      === Seq((1, 4L), (2, 1L), (3, 1L)))
  }

  private def createIdempotentTable(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE t_iload (k BIGINT, name VARCHAR(8), grp INT," +
          " bal DECIMAL(12,2), load_batch_id VARCHAR(64), load_part_id INT)")
      st.execute(
        "CREATE INDEX t_iload_batch ON t_iload (load_batch_id, load_part_id)")
    } finally conn.close()
  }

  private def loadedKeys(url: String, props: java.util.Properties): Seq[Long] =
    rows(Sources.readJdbc(spark, url, "t_iload", "k", 0L, 100L, 2, props)
      .orderBy(col("K"))).map(_.getLong(0))

  test("K3: idempotent load — replaying a batch is a no-op, new batches add") {
    val (url, props) = freshDb()
    createIdempotentTable(url)
    val cols = Seq("k", "name", "grp", "bal")
    Sinks.jdbcIdempotentLoad(sample, url, "t_iload", cols, "b1", props)
    assert(loadedKeys(url, props) === Seq(1L, 2L, 3L, 4L))
    // replay the SAME batch — the at-least-once failure mode of a plain
    // append (retry lands a second copy) must net zero here
    Sinks.jdbcIdempotentLoad(sample, url, "t_iload", cols, "b1", props)
    assert(loadedKeys(url, props) === Seq(1L, 2L, 3L, 4L))
    // a DIFFERENT batch id is a genuine append
    Sinks.jdbcIdempotentLoad(sample.filter(col("grp") === 1),
      url, "t_iload", cols, "b2", props)
    assert(loadedKeys(url, props) === Seq(1L, 1L, 2L, 3L, 3L, 4L))
    // replay of b2 under a COARSER partitioning (1 part vs the
    // original 2+) must clear the stale high-numbered slices too
    Sinks.jdbcIdempotentLoad(sample.filter(col("grp") === 1).coalesce(1),
      url, "t_iload", cols, "b2", props)
    assert(loadedKeys(url, props) === Seq(1L, 1L, 2L, 3L, 3L, 4L))
  }

  test("K3: idempotent load — a write killed mid-batch recovers on re-run") {
    import spark.implicits._
    val (url, props) = freshDb()
    createIdempotentTable(url)
    val cols = Seq("k", "name", "grp", "bal")
    // name VARCHAR(8): a 40-char name aborts ITS partition's
    // transaction mid-batch (Derby truncation error), after other
    // partitions may already have committed — the reference's
    // retry-after-partial scenario (`s3_to_postgres.py:76-82`)
    val poisoned = sample.union(
      Seq((9L, "x" * 40, 9, BigDecimal("1.00")))
        .toDF("k", "name", "grp", "bal")
        .select(col("k"), col("name"), col("grp"),
          col("bal").cast("decimal(12,2)").as("bal")))
      .repartition(4, col("k"))
    intercept[Exception] {
      Sinks.jdbcIdempotentLoad(poisoned, url, "t_iload", cols, "bX", props)
    }
    // the poisoned partition rolled back; others may have landed —
    // re-running the SAME batch with fixed data must converge to the
    // exact final state, no duplicates from the committed survivors
    val fixed = poisoned.filter(col("k") =!= 9L)
    Sinks.jdbcIdempotentLoad(fixed, url, "t_iload", cols, "bX", props)
    assert(loadedKeys(url, props) === Seq(1L, 2L, 3L, 4L))
    val bal = rows(Sources.readJdbc(spark, url, "t_iload", "k", 0L, 100L, 2, props)
      .agg(sum(col("BAL")).cast("decimal(18,2)").as("s"))).head.getDecimal(0)
    assert(bal.toPlainString === "14.25")
  }

  test("K3: idempotent load round-trips NULLs (typed setNull per column)") {
    import spark.implicits._
    val (url, props) = freshDb()
    createIdempotentTable(url)
    val withNulls = Seq(
      (1L, Some("a"), Some(1), Some(BigDecimal("2.50"))),
      (2L, None: Option[String], None: Option[Int], None: Option[BigDecimal]))
      .toDF("k", "name", "grp", "bal")
      .select(col("k"), col("name"), col("grp"),
        col("bal").cast("decimal(12,2)").as("bal"))
    Sinks.jdbcIdempotentLoad(withNulls, url, "t_iload",
      Seq("k", "name", "grp", "bal"), "bn", props)
    val got = rows(Sources.readJdbc(spark, url, "t_iload", "k", 0L, 100L, 2, props)
      .orderBy(col("K")))
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        Option(r.getDecimal(3)).map(_.toPlainString)))
    assert(got === Seq(
      (1L, Some("a"), Some(1), Some("2.50")),
      (2L, None, None, None)))
  }

  test("S7: scan partitions by stride and pushes filters into the source") {
    val (url, props) = freshDb()
    createTable(url)
    Sinks.jdbcAppend(sample, url, "t_load",
      Seq("k", "name", "grp", "bal"), props)
    val scan = Sources.readJdbc(spark, url, "t_load", "k", 0L, 100L, 4, props)
    assert(scan.rdd.getNumPartitions === 4)
    val filtered = scan.filter(col("k") > 2L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(K,2)"),
      s"filter not pushed into the JDBC source:\n$plan")
    assert(filtered.count() === 2)
  }
}
