package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query registry.
  *
  * Determinism rules (SURVEY.md §7.4.5 — DuckDB parity traps):
  *  - Every aggregate over doubles goes through an exact DECIMAL(18,2/4)
  *    cast so the sum is order-independent (shuffle order differs between
  *    engines; double addition does not commute). The testdata money/qty
  *    columns carry <= 2 decimals (verified), so the cast is lossless.
  *  - Every query ends in a total-order ORDER BY.
  *  - Column names are aliased identically in Spark and oracle SQL.
  */
object QueryUtil {

  /** Tables whose parquet carries TIMESTAMP(NANOS) columns (here: the
    * harness's `events.ts`). Scoped by table name so the generic loader
    * never reinterprets an ordinary bigint that happens to be named
    * `ts` (epoch-seconds logs etc.) as nanoseconds.
    */
  private val NanosTimestampCols: Map[String, Seq[String]] =
    Map("events" -> Seq("ts"))

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val nanosCols = NanosTimestampCols.getOrElse(name, Nil)
    // TIMESTAMP(NANOS) parquet: Spark has no nanosecond timestamp type
    // and rejects the file outright (PARQUET_TYPE_ILLEGAL) unless the
    // legacy conf surfaces it as an epoch-nanos long. Cast it back to
    // microsecond TimestampType (integral `div` — no double round-trip),
    // which is exactly DuckDB's ns->us truncation, so the oracle compare
    // sees identical values. The conf is session-wide and sticks — set
    // only when such a table is actually loaded.
    if (nanosCols.nonEmpty) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    nanosCols.foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c))
        d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      else d
    }
  }

  /** Order-independent sum of a <=2-decimal double column, as double. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Order-independent sum for derived 4-decimal expressions. */
  def dsum4(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Deterministic average: exact decimal sum (as double) over count. */
  def davg(c: Column): Column =
    dsum(c) / count(lit(1))
}
