package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Analytics

class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // user 1: full funnel; user 2: drops after b; user 3: does c BEFORE b
  // (must not count — steps are order-sensitive); user 4: never starts.
  private val events = Seq(
    (1L, 10L, "2024-01-01 10:00:00", "a"),
    (1L, 11L, "2024-01-01 10:05:00", "b"),
    (1L, 12L, "2024-01-01 10:10:00", "c"),
    (2L, 20L, "2024-01-02 09:00:00", "a"),
    (2L, 21L, "2024-01-02 09:30:00", "b"),
    (3L, 30L, "2024-01-03 08:00:00", "c"),
    (3L, 31L, "2024-01-03 08:30:00", "a"),
    (4L, 40L, "2024-01-04 12:00:00", "x")
  ).map { case (u, id, t, ty) => (u, id, ts(t), ty) }
    .toDF("user_id", "event_id", "ts", "event_type")

  test("funnelTimes: anonymous (NULL-user) events never form a phantom funnel row") {
    val anon = Seq(
      (Some(1L), ts("2024-01-01 10:00:00"), "a"),
      (Some(1L), ts("2024-01-01 10:05:00"), "b"),
      (None: Option[Long], ts("2024-01-01 11:00:00"), "a"),
      (None: Option[Long], ts("2024-01-01 12:00:00"), "a")
    ).toDF("user_id", "ts", "event_type")
    val f = rows(Analytics.funnelTimes(anon, "user_id", "ts", "event_type",
      Seq("a", "b")))
    // the NULL group used to aggregate ALL anonymous step-1 events into
    // one fabricated permanently-dropped-out user
    assert(f.size === 1 && f.head.getLong(0) === 1L)
  }

  test("funnelTimes: dropout stays dropped; out-of-order steps don't chain") {
    val f = rows(Analytics.funnelTimes(events, "user_id", "ts", "event_type",
        Seq("a", "b", "c")).orderBy("user_id"))
      .map(r => r.getLong(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(f(1L) === ((ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"),
      ts("2024-01-01 10:10:00"))))
    assert(f(2L)._2 === ts("2024-01-02 09:30:00") && f(2L)._3 == null)
    // user 3's c happened before their a: t_2 (b) null, so t_3 null too
    assert(f(3L)._1 === ts("2024-01-03 08:30:00"))
    assert(f(3L)._2 == null && f(3L)._3 == null)
    assert(!f.contains(4L)) // never did step 1 -> no row
  }

  test("funnelTimes: strictly-after — same-timestamp steps do not chain") {
    val same = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:00:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:00:01"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val r = rows(Analytics.funnelTimes(same, "user_id", "ts", "event_type",
      Seq("a", "b"))).head
    // the equal-ts b is skipped; the later one chains
    assert(r.getTimestamp(2) === ts("2024-01-01 10:00:01"))
  }

  test("funnelTimes: rejects colliding columns and duplicate steps") {
    intercept[IllegalArgumentException] {
      Analytics.funnelTimes(events.withColumn("t_1", lit(1)),
        "user_id", "ts", "event_type", Seq("a"))
    }
    intercept[IllegalArgumentException] {
      Analytics.funnelTimes(events, "user_id", "ts", "event_type",
        Seq("a", "a"))
    }
  }

  test("cohortRetention: offsets and shares against hand-computed cells") {
    // two cohorts: users 1,2 first-touch in week of Jan 1 (Mon);
    // user 3 in week of Jan 8. user 1 returns the next week.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-03 11:00:00")),
      (1L, ts("2024-01-09 09:00:00")), // week offset 1 for cohort Jan 1
      (3L, ts("2024-01-10 12:00:00"))
    ).toDF("user_id", "ts")
    val r = rows(Analytics.cohortRetention(ev, "user_id", "ts")
        .orderBy("cohort_week", "week_offset"))
      .map(x => (x.getDate(0).toString, x.getInt(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))
    assert(r === Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0)))
  }

  test("eventTransitions: counts adjacent pairs, rows normalize to 1") {
    // user 1: a->b->a->b ; user 2: a->b  =>  a->b: 3, b->a: 1
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "a"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "b"),
      (2L, 5L, ts("2024-01-01 11:00:00"), "a"),
      (2L, 6L, ts("2024-01-01 11:01:00"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val t = rows(Analytics.eventTransitions(ev, "user_id", "ts", "event_type",
        "event_id"))
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(t(("a", "b")) === ((3L, 1.0)))
    assert(t(("b", "a")) === ((1L, 1.0)))
    assert(t.size === 2)
    // no cross-user pair: user 2's 'a' never pairs with user 1's trailing 'b'
  }

  test("eventTransitions: NULL event types never mint transitions or break chains") {
    // user 1: a, <null-type>, b — a (prev -> NULL) pair would deflate
    // every real a->x probability, and downstream markovStationary's
    // equi-joins silently leak mass routed to a NULL state
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), null.asInstanceOf[String]),
      (1L, 3L, ts("2024-01-01 10:02:00"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val t = rows(Analytics.eventTransitions(ev, "user_id", "ts", "event_type",
        "event_id"))
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // the typeless event is nonexistent: the chain continues across it
    assert(t === Map(("a", "b") -> ((1L, 1.0))))
  }

  test("eventTransitions: equal timestamps break ties by the tiebreak column") {
    val ev = Seq(
      (1L, 2L, ts("2024-01-01 10:00:00"), "b"),
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 3L, ts("2024-01-01 10:00:01"), "c")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val t = rows(Analytics.eventTransitions(ev, "user_id", "ts", "event_type",
        "event_id"))
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(t === Set(("a", "b"), ("b", "c")))
  }
  test("markovStationary: alternating chain stays uniform, sink absorbs") {
    // A<->B alternator: uniform is stationary, share splits 50/50
    val alt = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "a"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "b"),
      (1L, 5L, ts("2024-01-01 10:04:00"), "a")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val u = rows(Analytics.markovStationary(alt, "user_id", "ts",
        "event_type", "event_id", iters = 2).orderBy(col("state")))
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(u === Seq(("a", 0.5, 0.5), ("b", 0.5, 0.5)))
    // a->b, b->b: b absorbs everything within 2 iterations
    val sink = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "b"),
      (1L, 4L, ts("2024-01-01 10:03:00"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val v = rows(Analytics.markovStationary(sink, "user_id", "ts",
        "event_type", "event_id", iters = 2).orderBy(col("state")))
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(v === Seq(("a", 0.0, 0.0), ("b", 1.0, 1.0)))
  }

  test("markovStationary: a no-outgoing state leaks mass; share reads NULL at full leak") {
    // a->b and b never moves on: after 2 steps all mass has leaked
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val r = rows(Analytics.markovStationary(ev, "user_id", "ts",
        "event_type", "event_id", iters = 2).orderBy(col("state")))
    assert(r.map(_.getDouble(1)) === Seq(0.0, 0.0))
    assert(r.forall(_.isNullAt(2))) // 0/0 renormalization -> NULL, not a crash
  }
  test("associationRules: hand-computed support/confidence/lift") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "a"), // repeat: sets, not bags
      (2L, 4L, ts("2024-01-01 11:00:00"), "a"),
      (2L, 5L, ts("2024-01-01 11:01:00"), "b"),
      (3L, 6L, ts("2024-01-01 12:00:00"), "a")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val r = rows(Analytics.associationRules(ev, "user_id", "event_type"))
    assert(r.size === 1)
    val p = r.head
    assert((p.getString(0), p.getString(1)) === (("a", "b")))
    assert((p.getLong(2), p.getLong(3), p.getLong(4)) === ((3L, 2L, 2L)))
    assert(p.getDouble(5) === BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) // support
    assert(p.getDouble(6) === BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) // conf a->b
    assert(p.getDouble(7) === 1.0)                            // conf b->a
    assert(p.getDouble(8) === 1.0)                            // lift
  }
  test("rollingUniques matches a driver-side brute force on random data") {
    val rnd = new scala.util.Random(5)
    val base = java.time.LocalDate.of(2024, 1, 1)
    val evs = (1 to 150).map { i =>
      val day = rnd.nextInt(20)
      (rnd.nextInt(12).toLong, i.toLong,
        ts(f"2024-01-${day + 1}%02d 0${rnd.nextInt(9)}:00:00"), "view")
    }
    val df = evs.toDF("user_id", "event_id", "ts", "event_type")
    val got = rows(Analytics.rollingUniques(df, "user_id", "ts", 7))
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byDay = evs.groupBy(_._3.toLocalDateTime.toLocalDate)
      .view.mapValues(_.map(_._1).toSet).toMap
    val want = byDay.keySet.toSeq.sorted.map { d =>
      val users = (0 until 7).flatMap(i =>
        byDay.getOrElse(d.minusDays(i.toLong), Set.empty[Long])).toSet
      (d, users.size.toLong)
    }
    assert(got === want)
  }

  test("rollingUniquesHll tracks the exact path within 2% on the same days") {
    val rnd = new scala.util.Random(7)
    val evs = (1 to 400).map { i =>
      val day = rnd.nextInt(20)
      (rnd.nextInt(120).toLong, i.toLong,
        ts(f"2024-01-${day + 1}%02d 0${rnd.nextInt(9)}:00:00"), "view")
    }
    val df = evs.toDF("user_id", "event_id", "ts", "event_type")
    val exact = rows(Analytics.rollingUniques(df, "user_id", "ts", 7))
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val est = rows(Analytics.rollingUniquesHll(df, "user_id", "ts", 7))
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    // same report-day set, and every estimate inside the sparse-mode band
    assert(est.map(_._1).toSet === exact.keySet)
    est.foreach { case (d, e) =>
      val x = exact(d)
      assert(math.abs(e - x).toDouble / x <= 0.02,
        s"day $d: est $e vs exact $x")
    }
  }
}
