package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def report(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
                     n: Int): Map[Long, (Long, Long, Boolean)] = {
    import spark.implicits._
    Decontaminate.run(corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"), n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("shared n-gram flags the doc; counts are distinct-gram counts") {
    val bench = Seq(100L -> "a b c d e f")
    val corpus = Seq(
      // shares the 5-grams "a b c d e" and "b c d e f"
      1L -> "x a b c d e f y",
      // repeats a contaminated gram — still counted once (distinct)
      2L -> "a b c d e z a b c d e",
      // same tokens, different order: no shared 5-gram
      3L -> "f e d c b a",
      // fewer than n tokens
      4L -> "a b c",
      5L -> ""
    )
    val got = report(corpus, bench, n = 5)
    assert(got(1L) == ((4L, 2L, true)))
    // 7 grams, 6 distinct ("a b c d e" appears twice); 1 in the benchmark
    assert(got(2L) == ((6L, 1L, true)))
    assert(got(3L) == ((2L, 0L, false)))
    assert(got(4L) == ((0L, 0L, false)))
    assert(got(5L) == ((0L, 0L, false)))
    assert(got.size == 5)
  }

  test("differential vs brute-force set intersection on a small-vocab corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d")
    def doc(len: Int): String = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpus = (0L until 40L).map(i => i -> doc(3 + rnd.nextInt(15)))
    val bench = (100L until 105L).map(i => i -> doc(10 + rnd.nextInt(10)))
    val n = 3
    def grams(s: String): Set[String] =
      s.split("\\s+").filter(_.nonEmpty).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet
    val benchSet = bench.flatMap(b => grams(b._2)).toSet
    val got = report(corpus, bench, n)
    for ((id, text) <- corpus) {
      val g = grams(text)
      val hits = g.count(benchSet.contains)
      assert(got(id) == ((g.size.toLong, hits.toLong, hits > 0)), s"doc $id")
    }
  }

  test("xxhash64 production mode produces the identical report") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpus = (0L until 30L).map(i => i -> doc(3 + rnd.nextInt(12))).toDF("doc_id", "text")
    val bench = (100L until 104L).map(i => i -> doc(12)).toDF("doc_id", "text")
    def rep(mode: String) = Decontaminate.run(corpus, bench, 3, hashMode = mode)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rep("md5") == rep("xxhash64"))
  }

  test("clean corpus: zero rows shuffle through the hit join") {
    val got = report(Seq(1L -> "p q r s t u"), Seq(9L -> "v w x y z v"), n = 5)
    assert(got(1L) == ((2L, 0L, false)))
  }
}
