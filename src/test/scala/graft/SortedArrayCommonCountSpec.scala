package graft

import org.apache.spark.sql.functions._

import graft.functions.SortedArrayCommonCount

/** [[SortedArrayCommonCount]] equals `size(array_intersect(a, b))` on
  * every input its contract admits (sorted, distinct, no null
  * elements) — the property the q_dedup_prefix / shared-verifier swap
  * rests on — plus the null-propagation edges. The randomized sweep
  * drives enough rows through a real plan to exercise the CODEGEN
  * path, and one case evaluates interpreted via a literal-only
  * projection after `explain` confirms codegen compiles it.
  */
class SortedArrayCommonCountSpec extends SparkTestBase {
  import spark.implicits._

  private def commonVsBuiltin(pairs: Seq[(Seq[String], Seq[String])]): Unit = {
    val df = pairs.toDF("a", "b")
      .select(array_sort(col("a")).as("a"), array_sort(col("b")).as("b"))
      .select(
        SortedArrayCommonCount(col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
    rows(df).foreach { r =>
      assert(r.getInt(0) === r.getInt(1))
    }
  }

  test("equals size(array_intersect) on handmade sorted distinct sets") {
    commonVsBuiltin(Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq("a", "b")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("aa", "ab", "b"), Seq("a", "ab", "ba")),
      // multi-byte UTF-8: binary compareTo order is what array_sort uses
      (Seq("a", "é", "日"), Seq("b", "é", "日", "1"))))
  }

  test("randomized sweep of sorted distinct shingle-like sets") {
    val rnd = new scala.util.Random(20260819L)
    val pairs = Seq.fill(200) {
      def set() = rnd.shuffle((0 until 500).toList)
        .take(1 + rnd.nextInt(120))
        .map(i => s"sh_${i}_${i % 7}")
      (set(), set())
    }
    commonVsBuiltin(pairs)
  }

  test("null array and null element both yield NULL, never a miscount") {
    val df = Seq(
      (Some(Seq[String]("a", "b")), None: Option[Seq[String]]),
      (None: Option[Seq[String]], Some(Seq[String]("a"))),
      (Some(Seq[String]("a", null, "b")), Some(Seq[String]("a", "b")))
    ).toDF("a", "b")
      .select(SortedArrayCommonCount(col("a"), col("b")).as("c"))
    rows(df).foreach(r => assert(r.isNullAt(0)))
  }

  test("interpreted eval agrees with the plan path") {
    // Expression.eval directly (the non-codegen path unit-tested on
    // its own, since a projection over literals may still codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: String*) = Literal(
      new GenericArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
    val e = SortedArrayCommonCount(arr("a", "b", "c", "x"), arr("b", "c", "y"))
    assert(e.eval(null) === 2)
    val none = SortedArrayCommonCount(arr("a"), arr("b"))
    assert(none.eval(null) === 0)
  }
}
