package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for the cross-engine ROUND-tie class (see
  * graft.functions.Num.portableRound6): every `round`-over-aggregate
  * in src/main must be either converted to the portable floor-chain
  * round or pinned HERE with its safe-class justification. A new site
  * fails this spec until triaged — the r9 incident (and the two r9
  * ADVICE escapes) were exactly sites that slipped past a by-hand
  * sweep.
  *
  * Documented-safe classes (from the r9 triage, judge-adjudicated):
  *  - integer ratio, small denominator: k/n with n < 128 cannot land
  *    on a .5e-6 boundary at all (the boundary's reduced denominator
  *    carries 2^7), and dyadic boundaries (n a multiple of 128 only)
  *    are exactly representable so both engines half-up identically;
  *    only n >= 640 with specific factorizations can diverge.
  *  - continuous values: means of genuinely continuous doubles
  *    (squared errors, z-scores) hit a .5e-6 boundary with measure
  *    zero AND the value itself is engine-identical IEEE arithmetic.
  *  - on-grid inputs: values already on the rounding grid — the round
  *    is an identity.
  */
class RoundTriageSpec extends AnyFunSuite {

  // Known blind spot: a built-in round over a PRE-COMPUTED aggregate
  // column (round(col("c2") / ...)) doesn't textually match — the
  // tripwire catches the common direct shapes, the review waves own
  // the rest.
  private val Patterns = Seq(
    "round(sum(", "ROUND(SUM(", "round(avg(", "ROUND(AVG(",
    "round(mean", "round(count(", "ROUND(COUNT(")

  /** (file base name, trimmed matching line) for every hit. */
  private def scan(): Set[(String, String)] = {
    val root = new java.io.File(
      graft.queries.QueryUtil.repoRoot, "src/main/scala/graft")
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(files)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    files(root).flatMap { f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines()
        .map(_.trim)
        .filter(l => Patterns.exists(l.contains))
        .map(l => f.getName -> l)
    }.toSet
  }

  test("every round-over-aggregate site is triaged (portable or pinned safe)") {
    // Each pinned line carries its safe class. Removals are fine
    // (conversion to portableRound); ADDITIONS must be triaged: either
    // convert to Num.portableRound + portableRoundSql in oracle
    // lockstep, or argue the safe class here.
    val pinnedSafe = Set(
      // integer counts in a windowed trailing mean: Σx and n are exact
      // integers, n <= window < 128 => no reachable .5e-6 boundary
      ("Anomaly.scala",
        """when(col("__n") >= minPrior, round(mean, 6)))"""),
      // ANN hit rate: integer ratio, n = probe count (5) < 128
      ("LlmQueries.scala",
        """round(count(col("__hit")).cast("double") / count(lit(1)), 6)"""),
      // recall@10 (oracle side): integer ratio, denominator = 10
      // exact-neighbor rows per probe, < 128
      ("LlmQueries.scala",
        """|  ROUND(COUNT(l.neighbor_id)::DOUBLE / COUNT(*), 6) AS recall_at_10"""),
      // OOV rate (oracle side): integer ratio over per-doc token
      // counts (max 100 across shipped SFs) < 128 — revisit if the
      // testdata generator starts emitting longer documents
      ("LlmQueries.scala",
        """| ROUND(COUNT(*) FILTER (tok NOT IN (SELECT tok FROM v))::DOUBLE"""),
      // Bloom FPR (oracle side): integer ratio; the negative-probe
      // denominator carries v2 < 7 at the shipped SFs (1198 at
      // sf0.01), and a .5e-6 boundary needs 2^7 | denominator —
      // revisit if the probe set or testdata generator changes
      ("RelationalQueries.scala",
        """|  ROUND(SUM(CASE WHEN pass = 1 AND truth = 0 THEN 1 ELSE 0 END)::DOUBLE"""))

    val found = scan()
    val untriaged = found.diff(pinnedSafe)
    val gone = pinnedSafe.diff(found)
    assert(untriaged.isEmpty,
      s"UNTRIAGED round-over-aggregate site(s) — convert to " +
        s"Num.portableRound (+ portableRoundSql oracle lockstep) or pin " +
        s"with a safe-class argument:\n${untriaged.mkString("\n")}")
    assert(gone.isEmpty,
      s"pinned site(s) no longer present — drop from the whitelist:\n" +
        gone.mkString("\n"))
  }
}
