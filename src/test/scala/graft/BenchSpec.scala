package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("timeQueries records per-query failures instead of swallowing them (VERDICT r2)") {
    val ok = (s: SparkSession, _: String) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }
    val bad: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("boom")
    val (best, cold, errs, skipped) =
      Bench.timeQueries(spark, "/nonexistent", Seq("good" -> ok, "bad" -> bad), repeats = 2)
    assert(errs.keySet == Set("bad"))
    assert(errs("bad").contains("boom"))
    assert(best.keySet == Set("good", "bad") && cold.keySet == best.keySet,
      "failed queries stay in the timing maps, marked by the error map")
    assert(best("good") > 0.0 && cold("good") >= best("good"))
    assert(skipped.isEmpty)
  }

  test("timeQueries stops starting queries past the section ceiling and lists the rest as skipped") {
    val q = (s: SparkSession, _: String) => { import s.implicits._; Seq(1).toDF("x") }
    val (best, cold, errs, skipped) =
      Bench.timeQueries(spark, "/none", Seq("a" -> q, "b" -> q, "c" -> q),
        repeats = 1, ceilingSec = -1.0)
    // Ceiling already exceeded before the first query: everything skips.
    assert(errs.isEmpty && best.isEmpty && cold.isEmpty)
    assert(skipped == Seq("a", "b", "c"))
  }

  test("timeQueries takes the min across passes for successful queries") {
    var calls = 0
    val counting = (s: SparkSession, _: String) => {
      calls += 1
      import s.implicits._
      Seq(calls).toDF("x")
    }
    val (best, cold, errs, _) =
      Bench.timeQueries(spark, "/none", Seq("q" -> counting), repeats = 3)
    assert(calls == 3 && errs.isEmpty)
    assert(best("q") <= cold("q"))
  }
}
