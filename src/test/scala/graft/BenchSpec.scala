package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-correctness tests for the bench's pass-merging: the reported
  * number is what the driver grades against BASELINE, so a wrong merge
  * silently corrupts the round's perf signal.
  */
class BenchSpec extends AnyFunSuite {

  test("min over successful passes; a fast failure never masks a slow success") {
    // pass 1 fails in 0.1 s, pass 2 succeeds in 30 s: report 30 s + err
    val (t, err) = Bench.pick(Seq((0.1, Some("boom")), (30.0, None)))
    assert(t === 30.0)
    assert(err === Some("boom"))
  }

  test("all passes succeed: plain min, no error") {
    assert(Bench.pick(Seq((2.0, None), (1.5, None))) === ((1.5, None)))
  }

  test("all passes fail: min of failure times, first error kept") {
    val (t, err) = Bench.pick(Seq((0.3, Some("a")), (0.2, Some("b"))))
    assert(t === 0.2)
    assert(err === Some("a"))
  }

  test("spread is max/min over successful passes only") {
    assert(Bench.spread(Seq((1.0, None), (3.0, None))) === 3.0)
    // the failed fast pass must not count toward spread
    assert(Bench.spread(Seq((0.1, Some("boom")), (2.0, None))) === 1.0)
    assert(Bench.spread(Seq((2.0, None))) === 1.0)
    assert(Bench.spread(Seq((0.2, Some("a")), (0.4, Some("b")))) === 1.0)
  }

  test("JSON escaper handles quotes, backslashes, and control chars") {
    assert(Jsons.str("a\"b\\c") === "\"a\\\"b\\\\c\"")
    assert(Jsons.str("x\n\t\ry") === "\"x\\n\\t\\ry\"")
    assert(Jsons.str("z" + 1.toChar) === "\"z\\" + "u0001\"")
  }
}
