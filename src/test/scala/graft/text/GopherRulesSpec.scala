package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Golden coverage for the rule branches the synthetic gate corpus never
  * exercises (it contains no symbols, no non-alpha words, no duplicate
  * lines — sym/alpha/dup pass for all 500 docs there; the gate verifies
  * wc/mwl/stop both ways).
  */
class GopherRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rules(texts: (Long, String)*): Map[Long, Map[String, Boolean]] = {
    import spark.implicits._
    val df = TextOps.gopherRules(texts.toSeq.toDF("doc_id", "text"))
    val cols = df.columns.drop(1)
    df.collect().map { r =>
      r.getLong(0) -> cols.zipWithIndex.map { case (c, i) => c -> r.getBoolean(i + 1) }.toMap
    }.toMap
  }

  test("clean doc passes every rule") {
    val text = (Seq.fill(2)("the") ++ Seq.fill(48)("abcd")).mkString(" ")
    val g = rules(1L -> text)(1L)
    assert(g.values.forall(identity), s"expected all-pass, got $g")
  }

  test("symbol-heavy doc fails sym_ok") {
    val text = ("the the " + Seq.fill(48)("#").mkString(" "))
    val g = rules(1L -> text)(1L)
    assert(!g("sym_ok") && !g("keep"))
    assert(g("wc_ok"), "50 words should still satisfy the count rule")
  }

  test("numeric doc fails alpha_ok") {
    val text = (Seq.fill(2)("the") ++ Seq.fill(48)("12345")).mkString(" ")
    val g = rules(1L -> text)(1L)
    assert(!g("alpha_ok") && !g("keep"))
    assert(g("sym_ok"))
  }

  test("repeated lines fail dup_ok") {
    val line = (Seq.fill(2)("the") ++ Seq.fill(12)("abcd")).mkString(" ")
    val text = Seq.fill(4)(line).mkString("\n")
    val g = rules(1L -> text)(1L)
    assert(!g("dup_ok") && !g("keep"))
    assert(g("wc_ok"), "56 words total")
  }

  test("short doc fails wc_ok; null text is safe and fails only wc") {
    val g = rules(1L -> "the of", 2L -> null)
    assert(!g(1L)("wc_ok") && g(1L)("stop_ok"))
    assert(!g(2L)("wc_ok") && g(2L)("dup_ok") && g(2L)("sym_ok"))
  }
}
