package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.functions.FastPercentile

/** Bit-equality of [[FastPercentile]] against Spark's builtin
  * `percentile` — the swap is only sound if every output double is
  * IDENTICAL (the registry's oracle hashes exact bytes). Every
  * comparison below asserts on raw `doubleToLongBits`, not approximate
  * equality, across the edge cases the builtin's boxed map encodes:
  * duplicates, negatives, signed zeros, NaN (sorts largest), single
  * row, empty input (null), grouped aggregation with partial merges,
  * long inputs, and a seeded randomized sweep.
  */
class FastPercentileSpec extends SparkTestBase with TableDrivenPropertyChecks {
  import spark.implicits._

  private def bitsOf(v: Any): Any = v match {
    case null => null
    case d: Double => java.lang.Double.doubleToLongBits(d)
    case s: Seq[_] => s.map(bitsOf)
    case other => other
  }

  /** Assert builtin and fast agree bit-for-bit on every row of a
    * grouped aggregation (`groupCols` may be empty = global).
    */
  private def assertSame(
      df: DataFrame, c: Column, pcts: Column, groupCols: Seq[String] = Nil): Unit = {
    val g = if (groupCols.isEmpty) df.groupBy() else
      df.groupBy(groupCols.map(col): _*)
    val both = g.agg(
      percentile(c, pcts).as("builtin"),
      FastPercentile.pctl(c, pcts).as("fast"))
    rows(both).foreach { r =>
      val b = r.get(r.fieldIndex("builtin"))
      val f = r.get(r.fieldIndex("fast"))
      assert(bitsOf(b) === bitsOf(f),
        s"builtin=$b fast=$f for groups=${groupCols.map(r.getAs[Any])}")
    }
  }

  test("doubles: scalar and array percentages, duplicates and negatives") {
    val df = Seq(3.5, -1.25, 3.5, 0.0, 7.875, -1.25, 2.0, 100.5, -44.0)
      .toDF("x")
    for (p <- Seq(0.0, 0.25, 0.5, 0.5137, 0.95, 1.0))
      assertSame(df, col("x"), lit(p))
    assertSame(df, col("x"),
      array(lit(0.49), lit(0.5), lit(0.51), lit(0.94), lit(0.95), lit(0.96)))
  }

  test("signed zeros: bit-equal when one kind present; numerically " +
    "equal (documented tie divergence) when mixed") {
    // one kind of zero: no sort tie exists, outputs are bit-identical
    assertSame(Seq(-0.0, -0.0, 1.0, -1.0).toDF("x"), col("x"), lit(0.4))
    assertSame(Seq(0.0, 0.0, 1.0, -1.0).toDF("x"), col("x"), lit(0.4))
    // BOTH zeros: the builtin's compareDoubles treats -0.0 == 0.0 as a
    // sort TIE whose order is its hash-map iteration layout (arbitrary
    // but deterministic); FastPercentile orders -0.0 < 0.0
    // (java.lang.Double.compare — strictly deterministic). The outputs
    // can differ only in the ZERO SIGN BIT, never numerically.
    val df = Seq(-0.0, 0.0, -0.0, 0.0, 1.0, -1.0).toDF("x")
    for (p <- Seq(0.0, 0.2, 0.3, 0.5, 0.7, 1.0)) {
      val r = rows(df.groupBy().agg(
        percentile(col("x"), lit(p)).as("builtin"),
        FastPercentile.pctl(col("x"), lit(p)).as("fast"))).head
      assert(r.getDouble(0) === r.getDouble(1)) // -0.0 == 0.0 under ==
    }
  }

  test("NaN sorts largest, exactly like the builtin") {
    val df = Seq(Double.NaN, 1.0, 2.0, Double.NaN, Double.PositiveInfinity,
      -3.0).toDF("x")
    for (p <- Seq(0.0, 0.5, 0.8, 0.99, 1.0))
      assertSame(df, col("x"), lit(p))
  }

  test("single row, empty input, all-null input") {
    assertSame(Seq(42.25).toDF("x"), col("x"), lit(0.5))
    val empty = Seq.empty[Double].toDF("x")
    assertSame(empty, col("x"), lit(0.5))
    assertSame(empty, col("x"), array(lit(0.1), lit(0.9)))
    val nulls = Seq[Option[Double]](None, None).toDF("x")
    assertSame(nulls, col("x"), lit(0.5))
  }

  test("long input: exact interpolation on integer keys") {
    val df = Seq(5L, 1L, 9L, 1L, 1000000007L, -17L, 0L).toDF("x")
    for (p <- Seq(0.0, 0.3, 0.5, 0.9, 1.0))
      assertSame(df, col("x"), lit(p))
    assertSame(df, col("x"), array(lit(0.5), lit(0.9)))
  }

  test("grouped aggregation with partial merges across partitions") {
    val df = spark.range(0, 20000, 1, 8)
      .select((col("id") % 7).as("g"),
        (pmod(xxhash64(col("id")), lit(10000)).cast("double") / 16.0).as("x"))
    assertSame(df, col("x"), lit(0.5), Seq("g"))
    assertSame(df, col("x"),
      array(lit(0.1), lit(0.25), lit(0.5), lit(0.75), lit(0.9)), Seq("g"))
  }

  test("randomized sweep: seeded uniform + heavy-duplicate doubles") {
    val rnd = new scala.util.Random(20260819L)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(400)
      val vals = Seq.fill(n) {
        rnd.nextInt(4) match {
          case 0 => rnd.nextInt(10).toDouble          // heavy duplicates
          case 1 => rnd.nextDouble() * 1e6 - 5e5
          case 2 => -rnd.nextDouble() / 1e3
          case _ => rnd.nextGaussian()
        }
      }
      val df = vals.toDF("x").repartition(1 + trial % 4)
      val ps = Seq.fill(1 + rnd.nextInt(4))(rnd.nextDouble())
      assertSame(df, col("x"), array(ps.map(lit): _*))
      assertSame(df, col("x"), lit(ps.head))
    }
  }

  test("sf0.001 lineitem prices: the swapped call-site shape verbatim") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assertSame(li, col("l_extendedprice"), lit(0.5))
    assertSame(li, col("l_extendedprice"),
      array((1 until 8).map(i => lit(i.toDouble / 8)): _*))
    assertSame(li, col("l_extendedprice"),
      array(lit(0.01), lit(0.99)), Seq("l_returnflag"))
  }
}
