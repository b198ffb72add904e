package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DupCoverageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)], n: Int): Map[Long, (Any, Long, Any)] = {
    import spark.implicits._
    Dedup.dupCoverage(docs.toDF("doc_id", "text"), n)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getDouble(3)))).toMap
  }

  /** Sequential replay: sliding n-gram occurrence counting + covered-
    * position union.
    */
  private def seqCover(docs: Seq[(Long, String)], n: Int): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val occ = for {
      (id, w) <- toks if w.size >= n
      i <- 0 to (w.size - n)
    } yield (id, i, w.slice(i, i + n).mkString(" "))
    val counts = occ.groupBy(_._3).map { case (g, l) => g -> l.size }
    val covered = occ.filter(o => counts(o._3) >= 2)
      .flatMap(o => (o._2 until o._2 + n).map(p => (o._1, p)))
      .distinct.groupBy(_._1).map { case (id, l) => id -> l.size.toLong }
    toks.map { case (id, w) =>
      id -> ((w.size.toLong, covered.getOrElse(id, 0L)))
    }.toMap
  }

  test("within-doc repeat covers both occurrences; coverage is positional union") {
    // "a b c d e" occurs at starts 0 and 6 → positions 0-4 and 6-10
    // covered, position 5 ("f") not: 10 of 11.
    val got = run(Seq(1L -> "a b c d e f a b c d e"), n = 5)
    assert(got(1L) == ((11L, 10L, 10.0 / 11)))
  }

  test("cross-doc duplicate at a different alignment is caught (stride-1 windows)") {
    val got = run(Seq(
      1L -> "p q r s t u",       // gram "q r s t u" at start 1
      2L -> "x q r s t u y z"    // same gram at start 1 of a longer doc
    ), n = 5)
    assert(got(1L) == ((6L, 5L, 5.0 / 6)))
    assert(got(2L) == ((8L, 5L, 5.0 / 8)))
  }

  test("overlapping duplicated grams merge into one covered run") {
    // docs share a 6-token run → two overlapping 5-grams each; union
    // covers exactly the 6 run positions per doc.
    val got = run(Seq(
      1L -> "a b c d e f",
      2L -> "a b c d e f"
    ), n = 5)
    assert(got(1L) == ((6L, 6L, 1.0)))
    assert(got(2L) == ((6L, 6L, 1.0)))
  }

  test("short and empty docs: no grams, zero coverage") {
    val got = run(Seq(1L -> "a b c", 2L -> "", 3L -> "a b c"), n = 5)
    // docs 1 and 3 are identical but shorter than n → invisible to the
    // n-gram relaxation (the documented contract).
    assert(got(1L) == ((3L, 0L, 0.0)))
    assert(got(2L) == ((0L, 0L, 0.0)))
    assert(got(3L) == ((3L, 0L, 0.0)))
  }

  test("matches the sequential replay on a generated corpus") {
    // Deterministic corpus with planted repeats: doc i repeats a shared
    // boilerplate span at varying offsets plus unique filler.
    val docs = (0L until 40L).map { i =>
      val filler = (0 until (i % 7).toInt + 3).map(j => s"u${i}_$j")
      val boiler = Seq("the", "quick", "brown", "fox", "jumps")
      val words =
        if (i % 3 == 0) filler ++ boiler ++ filler.map(_ + "x")
        else if (i % 3 == 1) boiler ++ filler
        else filler
      i -> words.mkString(" ")
    }
    val got = run(docs, n = 5)
    val want = seqCover(docs, n = 5)
    for ((id, (nt, cov)) <- want) {
      val (gnt, gcov, gfrac) = got(id)
      assert(gnt == nt && gcov == cov, s"doc $id")
      val expFrac: Any = if (nt > 0) cov.toDouble / nt else 0.0
      assert(gfrac == expFrac, s"doc $id frac")
    }
  }
}
