package graft

import org.apache.spark.sql.functions._

import graft.operators.Upsert

class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0)
  ).toDF("id", "name", "balance")

  test("upsert replaces matched keys, keeps unmatched, inserts new") {
    val updates = Seq(
      (2L, "bob", 99.0),     // update
      (4L, "dave", 5.0)      // insert
    ).toDF("id", "name", "balance")
    val out = rows(Upsert.upsert(base, updates, Seq("id")).orderBy(col("id")))
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out === Seq(
      (1L, "alice", 10.0), (2L, "bob", 99.0),
      (3L, "carol", 30.0), (4L, "dave", 5.0)))
  }

  test("upsert fails fast on a schema mismatch") {
    val bad = Seq((2L, "bob")).toDF("id", "name")
    intercept[org.apache.spark.sql.AnalysisException] {
      Upsert.upsert(base, bad, Seq("id")).collect()
    }
  }

  test("upsert with a composite key") {
    val b = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "v")
    val u = Seq((1L, "b", 9.0), (2L, "a", 7.0)).toDF("k1", "k2", "v")
    val out = rows(Upsert.upsert(b, u, Seq("k1", "k2")).orderBy(col("k1"), col("k2")))
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out === Seq((1L, "a", 1.0), (1L, "b", 9.0), (2L, "a", 7.0)))
  }
}
