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

  test("applyCdc: latest change wins per key; deletes remove; inserts land") {
    val changes = Seq(
      (1L, "alice", 10.0, 1L, "D"),  // delete alice
      (2L, "bob", 21.0, 1L, "U"),    // first update...
      (2L, "bob", 22.0, 2L, "U"),    // ...second wins
      (4L, "dave", 5.0, 1L, "I"),    // insert
      (5L, "eve", 7.0, 2L, "I"),     // insert then delete: delete wins
      (5L, "eve", 7.0, 3L, "D")
    ).toDF("id", "name", "balance", "ts", "op")
    val out = rows(Upsert.applyCdc(base, changes, Seq("id"), "ts", "op")
      .orderBy(col("id")))
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out === Seq(
      (2L, "bob", 22.0), (3L, "carol", 30.0), (4L, "dave", 5.0)))
  }

  test("applyCdc quarantines NULL-op/NULL-ts changes instead of silently deleting") {
    // a NULL op used to DELETE the base row: the key entered the
    // anti-join set while op =!= 'D' read NULL and dropped it from
    // survivors too — the row vanished with no error
    val base = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val changes = Seq(
      (1L, Some(5L), None: Option[String], "z"),      // NULL op
      (2L, None: Option[Long], Some("U"), "w"))       // NULL ts
      .toDF("k", "ts", "op", "v")
    val out = rows(Upsert.applyCdc(base, changes, Seq("k"), "ts", "op")
      .orderBy(col("k"))).map(r => (r.getLong(0), r.getString(1)))
    assert(out === Seq((1L, "x"), (2L, "y")),
      "malformed change rows must leave the base untouched")
  }

  test("applyCdc quarantines off-domain op codes instead of applying deletes as upserts") {
    // a lowercase 'd' (or 'DELETE', or 'D ') used to pass op =!= 'D'
    // and land the delete as a SURVIVOR — the base row was replaced
    // instead of removed, silently
    val base = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val changes = Seq(
      (1L, 5L, "d", "z"),       // lowercase delete: malformed, quarantined
      (2L, 5L, "DELETE", "w"))  // verbose delete: malformed, quarantined
      .toDF("k", "ts", "op", "v")
    val out = rows(Upsert.applyCdc(base, changes, Seq("k"), "ts", "op")
      .orderBy(col("k"))).map(r => (r.getLong(0), r.getString(1)))
    assert(out === Seq((1L, "x"), (2L, "y")),
      "off-domain op codes must leave the base untouched")
  }

  test("scd2Apply fails fast on a changes column absent from history") {
    // such a column influences the dedup tie-break, then is silently
    // dropped by the history-shaped projection — fail loud instead
    val history = Seq((1L, "a", 1L, Option.empty[Long]))
      .toDF("k", "v", "valid_from", "valid_to")
    val changes = Seq((1L, "b", 2L, "meta"))
      .toDF("k", "v", "ts", "_loaded_at")
    val e = intercept[IllegalArgumentException] {
      Upsert.scd2Apply(history, changes, Seq("k"), "ts")
    }
    assert(e.getMessage.contains("_loaded_at"))
  }

  test("scd2Apply: a NULL-key change cannot mint a second open version") {
    // the equi-joins never match a NULL key, so an unfiltered NULL-key
    // change appended a NEW open row while the existing NULL-key open
    // row stayed open — one extra open row per merge, compounding
    val history = Seq(
      (Option.empty[Long], "a", Some(1L), Option.empty[Long]),
      (Some(7L), "b", Some(1L), Option.empty[Long]))
      .toDF("k", "v", "valid_from", "valid_to")
    val changes = Seq((Option.empty[Long], 5L, "a2"))
      .toDF("k", "ts", "v")
    val out = Upsert.scd2Apply(history, changes, Seq("k"), "ts")
    val openNull = rows(out.filter(col("valid_to").isNull && col("k").isNull))
    assert(openNull.size === 1, "exactly the original open NULL-key row survives")
    assert(out.count() === 2, "the quarantined change adds nothing")
  }

  test("applyCdc same-instant tie: the upsert beats the delete deterministically") {
    val changes = Seq(
      (1L, "alice", 11.0, 5L, "D"),
      (1L, "alice", 11.0, 5L, "U")
    ).toDF("id", "name", "balance", "ts", "op")
    def run() = rows(Upsert.applyCdc(base, changes, Seq("id"), "ts", "op")
      .orderBy(col("id")))
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(run() === Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)))
    assert(run() === run())
  }

  test("upsert with a composite key") {
    val b = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "v")
    val u = Seq((1L, "b", 9.0), (2L, "a", 7.0)).toDF("k1", "k2", "v")
    val out = rows(Upsert.upsert(b, u, Seq("k1", "k2")).orderBy(col("k1"), col("k2")))
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out === Seq((1L, "a", 1.0), (1L, "b", 9.0), (2L, "a", 7.0)))
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val hist = Seq(
    (1L, "S1", ts("2026-01-01 00:00:00"), Some(ts("2026-02-01 00:00:00"))),
    (1L, "S2", ts("2026-02-01 00:00:00"), None),  // open
    (2L, "S1", ts("2026-01-01 00:00:00"), None),  // open, no changes
    (3L, "S9", ts("2026-01-01 00:00:00"), None)   // open
  ).toDF("id", "segment", "valid_from", "valid_to")

  test("scd2Apply sequences multi-change keys and closes the open row") {
    val changes = Seq(
      (1L, "S3", ts("2026-03-01 00:00:00")),
      (1L, "S4", ts("2026-04-01 00:00:00")),
      (3L, "S5", ts("2026-03-15 00:00:00")),
      (4L, "S0", ts("2026-03-20 00:00:00"))   // brand-new key
    ).toDF("id", "segment", "ts")
    val out = rows(Upsert.scd2Apply(hist, changes, Seq("id"), "ts")
      .orderBy(col("id"), col("valid_from")))
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3))))
    assert(out === Seq(
      // key 1: closed row untouched, open row closed at first change,
      // two new back-to-back versions, last one open
      (1L, "S1", ts("2026-01-01 00:00:00"), Some(ts("2026-02-01 00:00:00"))),
      (1L, "S2", ts("2026-02-01 00:00:00"), Some(ts("2026-03-01 00:00:00"))),
      (1L, "S3", ts("2026-03-01 00:00:00"), Some(ts("2026-04-01 00:00:00"))),
      (1L, "S4", ts("2026-04-01 00:00:00"), None),
      // key 2: untouched, still open
      (2L, "S1", ts("2026-01-01 00:00:00"), None),
      // key 3: one change
      (3L, "S9", ts("2026-01-01 00:00:00"), Some(ts("2026-03-15 00:00:00"))),
      (3L, "S5", ts("2026-03-15 00:00:00"), None),
      // key 4: inserted with no prior history, open
      (4L, "S0", ts("2026-03-20 00:00:00"), None)))
  }

  test("scd2Apply collapses duplicate (key, ts) to the greatest attr tuple") {
    val changes = Seq(
      (2L, "AAA", ts("2026-05-01 00:00:00")),
      (2L, "ZZZ", ts("2026-05-01 00:00:00"))
    ).toDF("id", "segment", "ts")
    val out = rows(Upsert.scd2Apply(hist, changes, Seq("id"), "ts")
      .filter(col("id") === 2L).orderBy(col("valid_from")))
      .map(r => (r.getString(1), Option(r.getTimestamp(3))))
    assert(out === Seq(
      ("S1", Some(ts("2026-05-01 00:00:00"))), ("ZZZ", None)))
  }

  test("scd2Apply fails fast on missing interval columns") {
    val noIv = Seq((1L, "x")).toDF("id", "segment")
    val changes = Seq((1L, "y", ts("2026-01-01 00:00:00")))
      .toDF("id", "segment", "ts")
    intercept[IllegalArgumentException] {
      Upsert.scd2Apply(noIv, changes, Seq("id"), "ts")
    }
  }

  test("diffSnapshots classifies I/D/U, skips unchanged, and NULL==NULL is no update") {
    val before = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0)
    ).toDF("id", "tag", "amt")
    val after = Seq(
      (1L, Some("a"), 10.0),                 // unchanged -> no row
      (2L, Some("B"), 20.0),                 // U (value change)
      (3L, None: Option[String], 30.0),      // unchanged with NULL tag -> no row
      (5L, Some("e"), 50.0)                  // I; id 4 -> D
    ).toDF("id", "tag", "amt")
    val out = rows(Upsert.diffSnapshots(before, after, Seq("id"))
      .orderBy(col("id")))
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(out === Seq(
      ("U", 2L, "B", 20.0),   // after image
      ("D", 4L, "d", 40.0),   // before image (the row being removed)
      ("I", 5L, "e", 50.0)))
  }

  test("diffSnapshots round-trips: applying the diff as CDC reconstructs 'after'") {
    val before = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    val after = Seq((1L, 1.0), (2L, 2.5), (5L, 5.0)).toDF("id", "v")
    val feed = Upsert.diffSnapshots(before, after, Seq("id"))
      .withColumnRenamed("change_type", "op")
      .withColumn("ts", lit(1L))
    val rebuilt = Upsert.applyCdc(before, feed, Seq("id"), "ts", "op")
    assert(rows(rebuilt.orderBy(col("id"))).map(r => (r.getLong(0), r.getDouble(1)))
      === rows(after.orderBy(col("id"))).map(r => (r.getLong(0), r.getDouble(1))))
  }

  test("diffSnapshots fails fast on schema mismatch and key-only tables") {
    val a = Seq((1L, "x")).toDF("id", "tag")
    intercept[IllegalArgumentException] {
      Upsert.diffSnapshots(a, a.withColumnRenamed("tag", "t2"), Seq("id"))
    }
    val keyOnly = Seq(Tuple1(1L)).toDF("id")
    intercept[IllegalArgumentException] {
      Upsert.diffSnapshots(keyOnly, keyOnly, Seq("id"))
    }
  }
  test("scd2Apply fails fast when changes carry the interval outputs") {
    import spark.implicits._
    val hist = Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      Option.empty[java.sql.Timestamp])).toDF("k", "attr", "valid_from", "valid_to")
    // a history export re-fed as a change batch: valid_to would be
    // classified as an attribute, then silently OVERWRITTEN
    val changes = Seq((1L, "b", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
      Option.empty[java.sql.Timestamp])).toDF("k", "attr", "ts", "valid_to")
    val e = intercept[IllegalArgumentException] {
      Upsert.scd2Apply(hist, changes, Seq("k"), "ts")
    }
    assert(e.getMessage.contains("valid_to"))
  }

  test("scd2Apply: NULL change timestamps are quarantined, never merged") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val hist = Seq((1L, "a", ts("2024-01-01 00:00:00"),
      Option.empty[java.sql.Timestamp])).toDF("k", "attr", "valid_from", "valid_to")
    // a NULL-ts change used to mint a NULL-valid_from version AND null
    // the open row's valid_to — TWO open rows per key
    val changes = Seq(
      (1L, "b", Option.empty[java.sql.Timestamp]),
      (2L, "c", Some(ts("2024-02-01 00:00:00"))))
      .toDF("k", "attr", "ts")
    val out = rows(Upsert.scd2Apply(hist, changes, Seq("k"), "ts")
      .orderBy(col("k"), col("valid_from")))
    assert(out.forall(!_.isNullAt(2)), "no NULL valid_from may appear")
    val openK1 = out.filter(r => r.getLong(0) == 1L && r.isNullAt(3))
    assert(openK1.size === 1 && openK1.head.getString(1) === "a",
      "key 1's history must be untouched by its NULL-ts change")
    assert(out.count(r => r.getLong(0) == 2L) === 1)
  }

  test("goldenRecord rejects the key column inside fields") {
    import spark.implicits._
    val df = Seq((1L, "x", "a")).toDF("k", "ord", "f")
    val e = intercept[IllegalArgumentException] {
      Upsert.goldenRecord(df, "k", "ord", Seq("k", "f"))
    }
    assert(e.getMessage.contains("group column"))
  }

  test("goldenRecord: each field follows its own freshest non-null feed") {
    import spark.implicits._
    val feed = Seq(
      // key 1: email arrives early, phone arrives late, name never
      (1L, "001", Option("a@x.io"), Option.empty[String], Option.empty[String]),
      (1L, "002", Option("b@x.io"), Option.empty[String], Option.empty[String]),
      (1L, "003", Option.empty[String], Option("555"), Option.empty[String]),
      // key 2: single row
      (2L, "001", Option.empty[String], Option("777"), Option("Zoe")))
      .toDF("k", "ord", "email", "phone", "name")
    val out = rows(graft.operators.Upsert.goldenRecord(
      feed, "k", "ord", Seq("email", "phone", "name")).orderBy(col("k")))
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getString(2) === "b@x.io") // latest NON-NULL, not latest row
    assert(out(0).getString(3) === "555")
    assert(out(0).isNullAt(4))               // never present stays NULL
    assert(out(1).getString(3) === "777" && out(1).getString(4) === "Zoe")
  }
}
