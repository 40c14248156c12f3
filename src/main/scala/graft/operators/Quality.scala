package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the validation layer a
  * warehouse load (reference: the blind `to_sql` append in
  * s3_to_postgres.py) is missing, and table stakes for a training-data
  * pipeline: reject/flag a drop BEFORE it poisons downstream state.
  *
  * Report schema (all checkers): (rule, violations, total_rows) — small
  * enough to sink anywhere, join against thresholds, or alert on.
  *
  * Scale shape: row-level rules are ONE aggregate pass regardless of
  * rule count (each rule is a conditional-sum aggregate — map-side
  * partials collapse the scan); uniqueness is the key groupBy it cannot
  * be cheaper than; referential checks join against the DISTINCT parent
  * key set (broadcast when the parent is a dim). Nothing collects to
  * the driver.
  */
object Quality {

  /** A row-level rule: rows where `passes` is not TRUE (false OR null)
    * count as violations — a null predicate result means the rule could
    * not positively pass, which a quality gate must flag, not excuse.
    */
  final case class Rule(name: String, passes: Column)

  /** All row-level rules in one aggregate pass over `df`. */
  def checkRows(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "checkRows needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    // each rule's count is aliased to a GENERATED name and the user's
    // rule name rides only as a literal: round-tripping the name
    // through col(...) would re-parse a dotted rule name
    // ("orders.amount_ok") as a struct-field access and fail analysis,
    // and a rule literally named __q_total would alias-collide
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      count_if(!coalesce(r.passes, lit(false))).as(s"__q_r$i")
    } :+ count(lit(1)).as("__q_total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__q_r$i").as("violations"))
    }: _*)
    one.select(explode(entries).as("e"), col("__q_total").as("total_rows"))
      .select(col("e.rule"), col("e.violations"), col("total_rows"))
  }

  /** Duplicate-key violations: rows in excess of one per key, under
    * ANSI/Postgres UNIQUE semantics — rows with a NULL in ANY key
    * component never conflict with anything (DISTINCT NULLs in SQL's
    * UNIQUE constraint), so a table full of NULL-keyed rows that the
    * target warehouse would accept does not read as duplicated here.
    * Nullness itself is a separate rule: gate it with a checkRows
    * `isNotNull` rule, not this one. NULL-keyed rows still count in
    * `total_rows` (the report's denominator is the table, not the
    * constraint's domain).
    */
  def checkUnique(df: DataFrame, keys: Seq[String], name: String): DataFrame = {
    // zero key columns would be a GLOBAL aggregate: a valid table
    // reads total_rows - 1 "violations" and any violations===0 gate
    // hard-fails the load
    require(keys.nonEmpty, "checkUnique needs at least one key column")
    val keyNonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__q_n"))
      // empty input: sums over zero groups are NULL, which a gate
      // comparing `violations > 0` / `=== 0` treats as neither —
      // report the (0, 0) checkRows/checkRef report instead
      .agg(coalesce(sum(when(keyNonNull, col("__q_n") - 1).otherwise(0L)),
          lit(0L)).as("violations"),
        coalesce(sum(col("__q_n")), lit(0L)).as("total_rows"))
      .select(lit(name).as("rule"), col("violations"), col("total_rows"))
  }

  /** Referential violations: non-null child keys absent from the parent
    * key set. The parent side is reduced to DISTINCT keys first, so a
    * dimension parent broadcasts and the child is never shuffled.
    */
  def checkRef(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    require(!child.columns.contains("__q_pk"),
      "child already has a column named __q_pk (reserved)")
    val p = parent.select(col(parentKey).as("__q_pk")).dropDuplicates()
    child.join(p, col(childKey) === col("__q_pk"), "left")
      .agg(
        count_if(col("__q_pk").isNull && col(childKey).isNotNull).as("violations"),
        count(lit(1)).as("total_rows"))
      .select(lit(name).as("rule"), col("violations"), col("total_rows"))
  }

  /** Union several checker outputs into one report, ordered by rule. */
  def report(checks: DataFrame*): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.reduce(_ unionByName _).orderBy(col("rule"))
  }
}
