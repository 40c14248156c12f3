package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

import graft.model.Schemas
import graft.model.Schemas.RunContext
import graft.sources.Sources
import graft.transform.{Velib, Weather}

/** Per-transform unit tests over the committed fixtures (SURVEY §5.2),
  * including the weather golden-contract test against the reference's
  * checked-in sample (`/root/reference/research/weather_data.csv:1`
  * fixes the column order).
  */
class VelibWeatherSpec extends SparkTestBase {

  private def raw = Sources.readVelibRaw(spark, s"$FixtureDir/station_status.json")

  test("flattenStations: one row per station per snapshot") {
    val flat = Velib.flattenStations(raw)
    assert(flat.count() === 6) // 2 snapshots x 3 stations
    assert(flat.schema("station_id").dataType === LongType)
  }

  test("curateStations keeps exactly the 7 reference columns with corrected types") {
    val cur = Velib.curateStations(Velib.flattenStations(raw))
    assert(cur.columns.toSeq === Seq("station_id", "num_bikes_available",
      "num_docks_available", "is_installed", "is_returning", "is_renting",
      "last_reported"))
    // station_id larger than 2^31 must survive intact (SURVEY §1.2: the
    // reference's FLOAT DDL would corrupt it)
    assert(rows(cur.filter(col("station_id") === 19179944124L)).nonEmpty)
    assert(cur.schema("last_reported").dataType === TimestampType)
  }

  test("withBikeTypes splits the array-of-single-key-maps") {
    val bt = Velib.withBikeTypes(Velib.flattenStations(raw))
      .filter(col("station_id") === 213688169L && col("last_reported") === 1706745000L)
    val r = rows(bt.select(col("num_bikes_mechanical"), col("num_bikes_ebike"))).head
    assert(r.getInt(0) === 3 && r.getInt(1) === 2)
  }

  test("dedupSnapshots drops exact re-reports, keeps changed reports") {
    val cur = Velib.curateStations(Velib.flattenStations(raw))
    assert(cur.count() === 6)
    val deduped = Velib.dedupSnapshots(cur)
    // station 99950133 re-reported the same last_reported in snapshot 2
    assert(deduped.count() === 5)
  }

  test("dedupSnapshots is idempotent") {
    val cur = Velib.curateStations(Velib.flattenStations(raw))
    val once = Velib.dedupSnapshots(cur)
    val twice = Velib.dedupSnapshots(once)
    // collected-set comparison (exceptAll on a plan and its own
    // dropDuplicates derivative trips ATTRIBUTE_NOT_FOUND in Spark 4.1)
    assert(rows(once).toSet === rows(twice).toSet)
  }

  test("latestPerStation keeps exactly one newest row per station") {
    val latest = Velib.latestPerStation(
      Velib.dedupSnapshots(Velib.curateStations(Velib.flattenStations(raw))))
    assert(latest.count() === 3)
    val m = rows(latest).map(r => r.getLong(0) -> r.getAs[Timestamp]("last_reported")).toMap
    assert(m(213688169L) === Timestamp.valueOf("2024-02-01 00:50:00"))
    assert(m(19179944124L) === Timestamp.valueOf("2024-02-01 00:55:00"))
  }

  test("latestPerStation tie on last_reported resolves deterministically, not by partition order") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2024-02-01 00:00:00")
    val tied = Seq(
      (1L, 3, ts), (1L, 9, ts), // same station, same report time, differing bikes
      (2L, 5, ts))
      .toDF("station_id", "num_bikes_available", "last_reported")
    def pick(df: org.apache.spark.sql.DataFrame) =
      rows(Velib.latestPerStation(df).orderBy(col("station_id")))
        .map(r => r.getLong(0) -> r.getInt(1))
    val a = pick(tied)
    assert(a === pick(tied.repartition(7)), "survivor must not depend on partitioning")
    assert(a === Seq(1L -> 9, 2L -> 5), "greatest attribute tuple wins the tie")
  }

  test("withSurrogateKey: a NULL part yields a NULL id, never a colliding short key") {
    import spark.implicits._
    // concat_ws silently skipped NULL parts: station 1 with a NULL ts
    // keyed "1", colliding with a NULL-station row reported at epoch 1
    val df = Seq(
      (Some(1L), Option.empty[Timestamp]),
      (Some(2L), Some(Timestamp.valueOf("2024-02-01 00:00:00"))))
      .toDF("station_id", "last_reported")
    val out = rows(Velib.withSurrogateKey(df).orderBy(col("station_id")))
    assert(out.head.isNullAt(out.head.fieldIndex("id")),
      "incomplete parts must read NULL, not a truncated key")
    assert(out(1).getAs[String]("id") === "2_1706745600")
  }

  test("withRunMetadata appends loader columns as constants") {
    val ctx = RunContext("2024-02-01 01:00:00", "dag", "task")
    val df = Velib.withRunMetadata(
      Velib.curateStations(Velib.flattenStations(raw)), ctx)
    val r = rows(df.select(col("execution_date"), col("dag_id"), col("task_id")).distinct())
    assert(r.size === 1)
    assert(r.head.getAs[Timestamp](0) === Timestamp.valueOf("2024-02-01 01:00:00"))
  }

  test("withSurrogateKey builds station_id + '_' + epoch (notebook cell 4 shape)") {
    val df = Velib.withSurrogateKey(
      Velib.dedupSnapshots(Velib.curateStations(Velib.flattenStations(raw))))
    assert(rows(df.filter(col("id") === "213688169_1706745000")).size === 1)
  }

  test("weather golden contract: column order of research/weather_data.csv") {
    val w = Weather.projectWeather(
      Sources.readWeatherRaw(spark, s"$FixtureDir/weather.json"))
    // header of /root/reference/research/weather_data.csv:1
    assert(w.columns.toSeq === Seq("temp", "feels_like", "pressure",
      "humidity", "wind_speed", "weather_description", "timestamp"))
    val first = rows(w.orderBy(col("timestamp"))).head
    assert(first.getDouble(0) === 277.99)
    assert(first.getString(5) === "light rain")
    assert(first.getAs[Timestamp](6) === Timestamp.valueOf("2024-02-01 00:00:00"))
  }

  test("weather: array index takes element 0 even with multiple conditions") {
    val w = Weather.projectWeather(
      Sources.readWeatherRaw(spark, s"$FixtureDir/weather.json"))
    val second = rows(w.orderBy(col("timestamp"))).last
    assert(second.getString(5) === "clear sky") // not "mist"
  }

  test("epoch->timestamp->string round-trip matches the reference strftime format") {
    val w = Weather.withFormattedTimestamp(Weather.projectWeather(
      Sources.readWeatherRaw(spark, s"$FixtureDir/weather.json")))
    val s = rows(w.orderBy(col("timestamp")).select(col("timestamp_str"))).head.getString(0)
    assert(s === "2024-02-01 00:00:00")
  }

  test("weather: empty weather array and off-key rain map are ANSI-safe") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("wx_empty")
    // valid API shapes the fixture lacks: weather PRESENT but empty,
    // rain PRESENT but without the "1h" key — under Spark 4's default
    // ANSI mode a plain element_at would raise INVALID_ARRAY_INDEX /
    // MAP_KEY_DOES_NOT_EXIST here instead of reading NULL
    Files.writeString(Paths.get(dir.toString, "w.json"),
      """{"current": {"dt": 1706745600, "temp": 1.5, "feels_like": 1.0,""" +
        """ "pressure": 1000, "humidity": 50, "wind_speed": 2.0,""" +
        """ "weather": [], "rain": {"3h": 0.4}}}""")
    val raw = Sources.readWeatherRaw(spark, dir.toString)
    val w = rows(Weather.projectWeather(raw)).head
    assert(w.isNullAt(w.fieldIndex("weather_description")))
    // the q_weather_rain read: present map lacking "1h" reads 0.0
    val r = rows(raw.select(
      coalesce(try_element_at(col("current.rain"), lit("1h")), lit(0.0))
        .as("rain_1h"))).head
    assert(r.getDouble(0) === 0.0)
  }

  test("raw read fails fast on malformed input") {
    import java.nio.file.{Files, Paths}
    val bad = Files.createTempDirectory("badjson")
    Files.writeString(Paths.get(bad.toString, "x.json"), """{"data": {"stations": [{"station_id": "not-a-number"}]}}""")
    intercept[Exception] {
      Sources.readVelibRaw(spark, bad.toString).collect()
    }
  }

  test("hourlyAvailability buckets by hour start") {
    val h = Velib.hourlyAvailability(
      Velib.dedupSnapshots(Velib.curateStations(Velib.flattenStations(raw))))
    val m = rows(h).map(r =>
      (r.getAs[Timestamp]("hour_start"), r.getLong(1)) -> r.getInt(2)).toMap
    assert(m((Timestamp.valueOf("2024-01-31 23:00:00"), 213688169L)) === 5)
    assert(m((Timestamp.valueOf("2024-02-01 00:00:00"), 213688169L)) === 4)
  }
  test("readJsonPermissive quarantines malformed lines instead of dying") {
    val df = graft.sources.Sources.readJsonPermissive(spark,
      "/root/repo/fixtures/station_status_mixed.json",
      graft.model.Schemas.velibRaw)
    val rows_ = df.collect()
    assert(rows_.length === 4)
    val (bad, good) = rows_.partition(r => r.getAs[String]("_corrupt") != null)
    assert(good.length === 2 && bad.length === 2)
    // corrupt rows carry the raw line whole and NULL schema fields
    assert(bad.forall(r => r.isNullAt(r.fieldIndex("ttl"))))
    assert(bad.exists(_.getAs[String]("_corrupt").startsWith("not json")))
    // good rows parse fully
    assert(good.map(_.getAs[Long]("ttl")).sorted === Seq(3600L, 7200L))
    // a caller schema already carrying _corrupt fails fast instead of
    // producing a duplicate-column frame (same rule on the stream twin)
    val clashing = graft.model.Schemas.velibRaw
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    val e = intercept[IllegalArgumentException] {
      graft.sources.Sources.readJsonPermissive(spark,
        "/root/repo/fixtures/station_status_mixed.json", clashing)
    }
    assert(e.getMessage.contains("_corrupt"))
  }
}
