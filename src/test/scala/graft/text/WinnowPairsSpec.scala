package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class WinnowPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pairs(docs: Seq[(Long, String)], minShared: Int, maxDf: Int,
                    k: Int = 8, w: Int = 4): Map[(Long, Long), Long] = {
    import spark.implicits._
    Dedup.winnowPairs(docs.toDF("doc_id", "text"), k, w, minShared, maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("winnowing guarantee: a shared >=w+k-1-char substring yields a pair") {
    val shared = "zqxjvkwpbfyg mlrthn" // 19 chars >= 4+8-1, vocab-free
    val docs = Seq(
      1L -> s"aaaa bbbb $shared cccc",
      2L -> s"dddd $shared eeee ffff",
      3L -> "entirely unrelated content here")
    val got = pairs(docs, minShared = 1, maxDf = 1000)
    assert(got.contains((1L, 2L)))
    assert(got.keySet.forall { case (a, b) => a < b })
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("df cap drops corpus-wide boilerplate fingerprints") {
    val boiler = "standard footer text shared by all"
    val docs = (1L to 6L).map(i => i -> s"$boiler unique$i").toSeq
    // Every fingerprint of the boilerplate hits all 6 docs: df cap 3
    // excludes them, so no pair survives.
    assert(pairs(docs, minShared = 1, maxDf = 3).isEmpty)
    // With the cap lifted, every pair shares the boilerplate prints.
    val open = pairs(docs, minShared = 1, maxDf = 1000)
    assert(open.size == 15)
  }

  test("differential vs set replay of the winnow fingerprint sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    val docs = (0L until 25L).map(i =>
      i -> Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val (minShared, maxDf) = (2, 5)
    val fps = TextOps.winnow(docs.toDF("doc_id", "text"), 8, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val want = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, ds) <- byFp if ds.length <= maxDf; a <- ds; b <- ds if a < b)
      want((a, b)) = want.getOrElse((a, b), 0L) + 1L
    val expected = want.filter(_._2 >= minShared).toMap
    assert(pairs(docs, minShared, maxDf) == expected)
  }
}
