package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PointerJumpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def resolve(m: Seq[(String, String)], maxRounds: Int = 20)
  : Map[String, (String, Long, Boolean)] = {
    import spark.implicits._
    PointerJump.resolve(m.toDF("src", "next"), maxRounds)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("straight chain resolves every prefix with exact hop counts") {
    val got = resolve(Seq("a" -> "b", "b" -> "c", "c" -> "d"))
    assert(got == Map(
      "a" -> (("d", 3L, true)),
      "b" -> (("d", 2L, true)),
      "c" -> (("d", 1L, true))))
  }

  test("fan-in: many chains sharing a terminal stay independent") {
    val got = resolve(Seq("x" -> "t", "y" -> "x", "z" -> "t"))
    assert(got == Map(
      "x" -> (("t", 1L, true)),
      "y" -> (("t", 2L, true)),
      "z" -> (("t", 1L, true))))
  }

  test("redirect loops are flagged unresolved, never looped on") {
    val got = resolve(Seq("a" -> "b", "b" -> "a", "s" -> "s", "c" -> "t"),
      maxRounds = 6)
    assert(got("c") == (("t", 1L, true)))
    assert(!got("a")._3 && !got("b")._3 && !got("s")._3)
  }

  test("chain into a loop is also flagged (no terminal exists)") {
    val got = resolve(Seq("p" -> "q", "q" -> "r", "r" -> "q"), maxRounds = 8)
    assert(!got("p")._3 && !got("q")._3 && !got("r")._3)
  }

  test("doubling: a 100-hop chain resolves within ceil(log2(100))+1 rounds") {
    // maxRounds = 8 < 100: a one-hop-per-round walker could not finish;
    // pointer doubling squares the jump so 2^7 = 128 >= 100 hops suffice.
    val chain = (0 until 100).map(i => s"n$i" -> s"n${i + 1}")
    val got = resolve(chain, maxRounds = 8)
    assert(got.size == 100)
    (0 until 100).foreach { i =>
      assert(got(s"n$i") == (("n100", (100 - i).toLong, true)), s"node n$i")
    }
  }

  test("maxRounds honesty: the same chain at maxRounds=3 reports partial rows unresolved") {
    val chain = (0 until 100).map(i => s"n$i" -> s"n${i + 1}")
    val got = resolve(chain, maxRounds = 3)
    // 3 doubling rounds cannot finish the deep prefixes...
    assert(!got("n0")._3)
    // ...but the shallow suffix is: rows within 2^3 − 1 = 7 hops of the
    // terminal resolve (n92 at distance 8 has already JUMPED to the
    // terminal with exact hops, but its terminal-detection round never
    // runs, so it still reports unresolved — resolution lags the jump by
    // one detection round).
    assert(got("n99") == (("n100", 1L, true)))
    assert(got("n93")._3)
    assert(!got("n92")._3)
  }
}
