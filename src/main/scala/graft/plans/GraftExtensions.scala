package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Coalesce, Divide, EvalMode, Expression, ExpressionInfo, Literal, Multiply, NaNvl, Sqrt}

import graft.functions.{FloatVecDot, FloatVecNormSq}

/** Session extension making the engine's native vector expressions
  * available to the SQL surface — `spark.sql("SELECT fvec_dot(a, b)")`
  * — not just the Scala Column DSL (`VectorOps`). Register with
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * The functions resolve to the same codegen'd Catalyst expressions the
  * DSL uses (`functions/VectorExpressions.scala`), so SQL callers get
  * the tight-loop whole-stage-codegen form, not an interpreted HOF.
  *
  * Also injects [[BandJoinRewrite]] (opt-in via
  * `spark.graft.bandjoin.width`), which rewrites band-only range joins
  * from the BroadcastNestedLoopJoin fallback into the binned equi-join
  * shape — including for plain SQL, where the DataFrame-level
  * `RangeJoin` operator is out of reach.
  *
  * These are the engine's only `SparkSessionExtensions` hooks by
  * design: SURVEY §4.2's finding is that reference parity needs ZERO
  * custom planner surface, and every operator here stays a declarative
  * DataFrame plan Catalyst can optimize — extensions are reserved for
  * where built-ins measurably fail (the vector hot path; the missing
  * range-join strategy).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // The non-deprecated ExpressionInfo constructors either drop the
  // usage text or validate "source"/"group" against built-in-only
  // vocabularies; the deprecated 5-arg form is the one that carries
  // free-form usage for DESCRIBE FUNCTION.
  @scala.annotation.nowarn("cat=deprecation")
  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  /** Arity check at analysis time: without it a wrong-arity SQL call
    * dies inside the builder with a raw IndexOutOfBoundsException
    * instead of a readable error.
    */
  private def arity(name: String, n: Int)(children: Seq[Expression]): Unit =
    if (children.size != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${children.size}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => BandJoinRewrite(session))

    ext.injectFunction((
      FunctionIdentifier("fvec_dot"),
      info(classOf[FloatVecDot], "fvec_dot",
        "fvec_dot(a, b) - dot product of two array<float> in double, " +
          "left-to-right accumulation; null on length mismatch or null element"),
      (children: Seq[Expression]) => {
        arity("fvec_dot", 2)(children)
        FloatVecDot(children(0), children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("fvec_normsq"),
      info(classOf[FloatVecNormSq], "fvec_normsq",
        "fvec_normsq(a) - squared L2 norm of an array<float> in double"),
      (children: Seq[Expression]) => {
        arity("fvec_normsq", 1)(children)
        FloatVecNormSq(children.head)
      }))

    // Composed form, same tree as VectorOps.cosineSimilarity —
    // coalesce(nanvl(try_divide(dot, |a||b|), -2), -2): identical bits
    // to a plain division on real vectors, and degenerate (zero-norm /
    // NaN) vectors pin to the -2 sentinel instead of raising ANSI
    // DIVIDE_BY_ZERO (ExtensionsSpec asserts SQL == DSL bit-for-bit).
    // No single implementing expression class exists, so DESCRIBE
    // FUNCTION points at the builder (this class) rather than
    // misattributing one component.
    ext.injectFunction((
      FunctionIdentifier("fvec_cos"),
      info(classOf[GraftExtensions], "fvec_cos",
        "fvec_cos(a, b) - cosine similarity of two array<float>; " +
          "-2.0 on zero-norm, NaN, or null input"),
      (children: Seq[Expression]) => {
        arity("fvec_cos", 2)(children)
        val sentinel = Literal(graft.functions.VectorOps.DegenerateCos)
        Coalesce(Seq(
          NaNvl(
            Divide(
              FloatVecDot(children(0), children(1)),
              Multiply(Sqrt(FloatVecNormSq(children(0))),
                Sqrt(FloatVecNormSq(children(1)))),
              EvalMode.TRY),
            sentinel),
          sentinel))
      }))

    // Composed regex/replace chain mirroring Text.stripHtml — the
    // web-corpus text extractor for SQL callers. Built directly from
    // catalyst nodes (a Column->Expression round-trip leaves
    // unresolved ColumnNode wrappers the analyzer won't touch inside a
    // function builder); the pattern/entity constants are SHARED with
    // the DSL form, and ExtensionsSpec asserts SQL == DSL bit-for-bit,
    // so the two chains cannot drift.
    ext.injectFunction((
      FunctionIdentifier("strip_html"),
      info(classOf[GraftExtensions], "strip_html",
        "strip_html(html) - text extracted from HTML: drops script/" +
          "style/head subtrees and comments, strips tags, decodes the " +
          "six common entities, collapses whitespace"),
      (children: Seq[Expression]) => {
        arity("strip_html", 1)(children)
        import org.apache.spark.sql.catalyst.expressions.{RegExpReplace, StringReplace, StringTrim}
        import graft.functions.Text
        def rr(e: Expression, pat: String): Expression =
          RegExpReplace(e, Literal(pat), Literal(" "))
        // comments strip FIRST, subtrees second, tags last — the
        // DSL's order (Text.stripHtml documents why: a commented-out
        // "<!-- <script> -->" opener would otherwise pair with a later
        // REAL </script> and delete the prose in between, and the
        // orphaned "<!--" leaks). The SQL chain had inverted the first
        // two steps, diverging from the DSL on exactly that input.
        val noComments = rr(children.head, Text.HtmlCommentPattern)
        val noBlocks = Text.HtmlSubtreePatterns.foldLeft(noComments)(rr)
        val noTags = rr(noBlocks, Text.HtmlTagPattern)
        val decoded = Text.HtmlEntities.foldLeft(noTags) {
          case (e, (ent, ch)) => StringReplace(e, Literal(ent), Literal(ch))
        }
        StringTrim(RegExpReplace(
          decoded, Literal(Text.WhitespaceRunPattern), Literal(" ")))
      }))

    // The portable-hash primitive behind every deterministic
    // sample/split/shard/LSH decision — exposed so SQL callers (and
    // ad-hoc audits of those decisions) compute the identical draw the
    // operators did, through the same allocation-free kernel.
    ext.injectFunction((
      FunctionIdentifier("md5_long64"),
      info(classOf[graft.functions.Md5Long64], "md5_long64",
        "md5_long64(s) - first 8 md5 digest bytes of s as a signed " +
          "big-endian long (engine-portable: equals DuckDB's " +
          "('0x' || substr(md5(s), 1, 16))::UBIGINT reinterpreted signed)"),
      (children: Seq[Expression]) => {
        arity("md5_long64", 1)(children)
        graft.functions.Md5Long64(children.head)
      }))
  }
}
