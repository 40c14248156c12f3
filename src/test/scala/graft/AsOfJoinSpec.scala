package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def left = Seq(
    // (key, ts, payload)
    ("u1", 100L, "p1"),
    ("u1", 200L, "p2"),
    ("u2", 150L, "p3"),
    ("u3", 50L, "p4") // u3 has no right rows at all
  ).toDF("user_id", "ts", "payload")

  test("backward as-of picks the most recent right row at or before left.ts") {
    val right = Seq(
      ("u1", 90L, 1.0),
      ("u1", 150L, 2.0),
      ("u1", 201L, 3.0), // after both left rows — never matched
      ("u2", 150L, 4.0)  // exactly simultaneous — IS matched (>=)
    ).toDF("user_id", "ts", "v")

    val out = AsOfJoin.asof(left, right, "user_id", "ts", "ts",
      Map("ts" -> "r_ts", "v" -> "r_v"))
    val m = rows(out).map(r =>
      (r.getAs[String]("user_id"), r.getAs[Long]("ts")) ->
        (r.getAs[Long]("r_ts"), r.getAs[Double]("r_v"))).toMap

    assert(m(("u1", 100L)) === ((90L, 1.0)))
    assert(m(("u1", 200L)) === ((150L, 2.0)))
    assert(m(("u2", 150L)) === ((150L, 4.0)))
    assert(!m.contains(("u3", 50L))) // inner: unmatched left dropped
  }

  test("tolerance: a stale match becomes no match in both inner and outer modes") {
    val right = Seq(
      ("u1", 90L, 1.0),   // 10 away from left@100 — inside tolerance 20
      ("u1", 150L, 2.0),  // 50 away from left@200 — stale at tolerance 20
      ("u2", 150L, 4.0)   // exact tie: distance 0 always inside
    ).toDF("user_id", "ts", "v")
    val inner = rows(AsOfJoin.asof(left, right, "user_id", "ts", "ts",
      Map("v" -> "r_v"), tolerance = Some(lit(20L))))
      .map(r => (r.getAs[String]("user_id"), r.getAs[Long]("ts"),
        r.getAs[Double]("r_v")))
    // the stale u1@200 match and the matchless u3 are both dropped;
    // staleness does NOT fall back to an even older row
    assert(inner.toSet === Set(("u1", 100L, 1.0), ("u2", 150L, 4.0)))
    val outer = rows(AsOfJoin.asof(left, right, "user_id", "ts", "ts",
      Map("v" -> "r_v"), inner = false, tolerance = Some(lit(20L))))
    assert(outer.size === 4)
    val stale = outer.find(r => r.getAs[String]("user_id") == "u1" &&
      r.getAs[Long]("ts") == 200L).get
    assert(stale.isNullAt(stale.fieldIndex("r_v")))
  }

  test("outer variant keeps unmatched left rows with null carried values") {
    val right = Seq(("u1", 90L, 1.0)).toDF("user_id", "ts", "v")
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "ts",
      Map("v" -> "r_v"), inner = false)
    assert(out.count() === 4)
    val u3 = rows(out.filter(col("user_id") === "u3")).head
    assert(u3.isNullAt(u3.fieldIndex("r_v")))
  }

  test("name collisions fail fast instead of emitting duplicate or clobbered columns") {
    val right = Seq(("u1", 90L, 1.0)).toDF("user_id", "ts", "v")
    // a DOTTED carried destination is legal (struct field names may
    // contain dots): the old col("__r.name") projection parsed the dot
    // as struct nesting and failed analysis far from the cause
    val dotted = rows(AsOfJoin.asof(left, right, "user_id", "ts", "ts",
      Map("v" -> "station.status")))
    assert(dotted.head.schema.fieldNames.contains("station.status"))
    // carried destination shadows an existing left column
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, "user_id", "ts", "ts", Map("v" -> "payload"))
    }
    assert(e1.getMessage.contains("payload"))
    // two sources carried to the same destination
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, "user_id", "ts", "ts",
        Map("v" -> "x", "ts" -> "x"))
    }
    assert(e2.getMessage.contains("x"))
    // left column named like an internal scratch column
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left.withColumn("__r", lit(1)), right,
        "user_id", "ts", "ts", Map("v" -> "r_v"))
    }
    assert(e3.getMessage.contains("__r"))
  }

  test("a matched right row with NULL carried values still counts as a match") {
    val right = Seq(
      ("u1", 90L, null.asInstanceOf[java.lang.Double]),
      ("u2", 100L, java.lang.Double.valueOf(7.0))
    ).toDF("user_id", "ts", "v")

    val out = AsOfJoin.asof(left, right, "user_id", "ts", "ts",
      Map("v" -> "r_v"))
    // u1's rows match the null-valued right row — they must survive inner
    val u1 = rows(out.filter(col("user_id") === "u1"))
    assert(u1.size === 2)
    assert(u1.forall(_.isNullAt(u1.head.fieldIndex("r_v"))))
    // and u2 still carries its real value
    val u2 = rows(out.filter(col("user_id") === "u2")).head
    assert(u2.getAs[Double]("r_v") === 7.0)
  }

  test("asof agrees with a brute-force reference on seeded random data") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val leftRows = Seq.fill(300)(
        (rnd.nextInt(8).toLong, rnd.nextInt(1000), rnd.nextInt(100)))
      // unique (key, ts) on the right: simultaneous right duplicates have
      // no defined winner (any total order would be arbitrary), so the
      // operator's contract assumes event streams deduped on the key+time
      val rightRows = Seq.fill(150)(
        (rnd.nextInt(10).toLong, rnd.nextInt(1000), rnd.nextInt(100)))
        .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      val got = AsOfJoin.asof(
        leftRows.toDF("k", "lts", "lval"), rightRows.toDF("k", "rts", "rv"),
        "k", "lts", "rts", Map("rv" -> "rv"))
        .collect().map(r =>
          (r.getAs[Long]("k"), r.getAs[Int]("lts"),
            r.getAs[Int]("lval"), r.getAs[Int]("rv"))).sorted.toSeq
      val expected = leftRows.flatMap { case (k, lts, lv) =>
        val cands = rightRows.filter(r => r._1 == k && r._2 <= lts)
        if (cands.isEmpty) None else Some((k, lts, lv, cands.maxBy(_._2)._3))
      }.sorted
      assert(got === expected, s"trial $trial diverged from brute force")
    }
  }

  test("plan shuffles exactly once (single Exchange on the key)") {
    val right = Seq(("u1", 90L, 1.0)).toDF("user_id", "ts", "v")
    val out = AsOfJoin.asof(left, right, "user_id", "ts", "ts", Map("v" -> "r_v"))
    val exchanges = "Exchange".r.findAllIn(planString(out)).size
    assert(exchanges === 1, s"expected 1 exchange, plan:\n${planString(out)}")
  }

  test("forward as-of picks the earliest right row at or after left.ts") {
    val right = Seq(
      ("u1", 90L, 1.0),  // before every left row — never matched forward
      ("u1", 150L, 2.0), // next after u1@100
      ("u1", 250L, 3.0), // next after u1@200
      ("u2", 150L, 4.0)  // exactly simultaneous — IS matched (<=)
    ).toDF("user_id", "ts", "v")
    val out = AsOfJoin.asofForward(left, right, "user_id", "ts", "ts",
      Map("ts" -> "r_ts", "v" -> "r_v"))
    val m = rows(out).map(r =>
      (r.getAs[String]("user_id"), r.getAs[Long]("ts")) ->
        (r.getAs[Long]("r_ts"), r.getAs[Double]("r_v"))).toMap
    assert(m === Map(
      ("u1", 100L) -> ((150L, 2.0)),
      ("u1", 200L) -> ((250L, 3.0)),
      ("u2", 150L) -> ((150L, 4.0))))
    // u3 dropped (inner), included null-extended when inner = false
    val outer = rows(AsOfJoin.asofForward(left, right, "user_id", "ts", "ts",
      Map("v" -> "r_v"), inner = false))
    assert(outer.size === 4)
    assert(outer.exists(r => r.getAs[String]("user_id") == "u3" && r.isNullAt(3)))
  }

  test("forward tolerance bounds matchedRightTs - leftTs") {
    val right = Seq(("u1", 150L, 2.0), ("u1", 500L, 9.0)).toDF("user_id", "ts", "v")
    val out = rows(AsOfJoin.asofForward(left, right, "user_id", "ts", "ts",
      Map("ts" -> "r_ts"), tolerance = Some(lit(60L))))
    // u1@100 -> 150 (gap 50, kept); u1@200 -> 500 (gap 300, dropped)
    assert(out.map(r => (r.getAs[String]("user_id"), r.getAs[Long]("ts"),
      r.getAs[Long]("r_ts"))) === Seq(("u1", 100L, 150L)))
  }

  test("cross-side type drift fails fast instead of coercing the timeline") {
    // INT-epoch left vs STRING right: the union would widen __ts to
    // STRING and sort time LEXICOGRAPHICALLY ("9999" > "19000")
    val l = Seq(("u1", 100L, "p")).toDF("user_id", "ts", "payload")
    val rStr = Seq(("u1", "50", 1.0)).toDF("user_id", "rts", "temp")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, rStr, "user_id", "ts", "rts", Map("temp" -> "temp"))
    }
    assert(e.getMessage.contains("types differ"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, Seq((1L, 50L, 1.0)).toDF("user_id", "rts", "temp"),
        "user_id", "ts", "rts", Map("temp" -> "temp"))
    }
    assert(e2.getMessage.contains("user_id"))
  }

  test("NULL join fields never match (SQL ASOF semantics)") {
    // a NULL-ts right row must not be carried to every later left row
    val nullTsRight = Seq(("u1", Option.empty[Long], 7.0), ("u1", Option(90L), 1.0))
      .toDF("user_id", "ts", "v")
    val back = rows(AsOfJoin.asof(left, nullTsRight, "user_id", "ts", "ts",
      Map("v" -> "rv")))
    assert(back.forall(_.getAs[Double]("rv") == 1.0),
      "NULL-ts right row leaked into a match")
    // forward mode: a NULL-ts LEFT row reads unmatched, not the
    // minimum-ts right row (desc NULLS-LAST would otherwise carry it)
    val nullTsLeft = Seq(("u1", Option(100L), "a"), ("u1", Option.empty[Long], "b"))
      .toDF("user_id", "ts", "payload")
    val fwd = rows(AsOfJoin.asofForward(nullTsLeft,
      Seq(("u1", 150L, 2.0)).toDF("user_id", "ts", "v"),
      "user_id", "ts", "ts", Map("v" -> "rv"), inner = false))
    val byPayload = fwd.map(r => r.getAs[String]("payload") ->
      Option(r.getAs[java.lang.Double]("rv"))).toMap
    assert(byPayload("a") === Some(2.0))
    assert(byPayload("b") === None, "NULL-ts left row matched a right row")
    // a NULL-key right row must not meet a NULL-key left row
    val nullKeyRight = Seq((Option.empty[String], 90L, 5.0))
      .toDF("user_id", "ts", "v")
    val nullKeyLeft = Seq((Option.empty[String], 100L, "x"))
      .toDF("user_id", "ts", "payload")
    val nk = rows(AsOfJoin.asof(nullKeyLeft, nullKeyRight,
      "user_id", "ts", "ts", Map("v" -> "rv"), inner = false))
    assert(nk.size === 1 && nk.head.isNullAt(nk.head.fieldIndex("rv")))
  }
}
