package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bloomBytes(keys: Seq[Long], fpp: Double): Array[Byte] = {
    val bf = keys.toDF("k").stat.bloomFilter("k", keys.size.max(1).toLong, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("bloom probe: zero false negatives, fpp-bounded false positives") {
    val members = (0L until 2000L).map(_ * 3)
    val bytes = bloomBytes(members, 0.01)
    val probe = (0L until 6000L).toDF("k")
      .select($"k", SketchExpressions.bloomMightContain($"k", bytes).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    members.foreach(k => assert(probe(k), s"false negative on $k"))
    val nonMembers = (0L until 6000L).filterNot(_ % 3 == 0)
    val fp = nonMembers.count(probe(_)).toDouble / nonMembers.size
    assert(fp < 0.03, s"false-positive rate $fp far above configured 0.01")
  }

  test("bloom-pruned semi-join is exact (prune + verify == plain semi-join)") {
    val dim = (0L until 500L).filter(_ % 7 == 0).toDF("key")
    val fact = (0L until 5000L).map(i => (i % 500, i)).toDF("key", "payload")
    val bytes = bloomBytes((0L until 500L).filter(_ % 7 == 0), 0.05)
    val pruned = fact.filter(SketchExpressions.bloomMightContain($"key", bytes))
    assert(pruned.count() < fact.count(), "bloom should prune some rows")
    val got = pruned.join(dim, Seq("key"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = fact.join(dim, Seq("key"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("cms estimate never under-counts; heavy-hitter prune+verify is exact") {
    // Zipf-ish corpus: token t_i appears (1000 / (i+1)) times.
    val toks = (0 until 400).flatMap(i => Seq.fill(1000 / (i + 1))(s"t$i"))
    val df = new scala.util.Random(3).shuffle(toks).toDF("tok")
    val cms = df.stat.countMinSketch("tok", 0.005, 0.99, 42)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val bytes = bos.toByteArray

    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = df.distinct()
      .select($"tok", SketchExpressions.cmsEstimate($"tok", bytes).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS under-counted $t: est ${est(t)} < true $c")
    }

    val T = 50L
    val got = df
      .filter(SketchExpressions.cmsEstimate($"tok", bytes) >= T)
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= T)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = exact.filter(_._2 >= T)
    assert(got == want, "prune+verify heavy hitters must equal the exact set")
  }

  test("int keys work through both probes (type dispatch)") {
    val bytes = bloomBytes(Seq(1L, 2L, 3L), 0.01)
    val hits = Seq(1, 2, 3, 4).toDF("k")
      .select(SketchExpressions.bloomMightContain($"k", bytes).as("h"))
      .collect().map(_.getBoolean(0))
    assert(hits.take(3).forall(identity))
    val cms = Seq(7, 7, 8).toDF("k").stat.countMinSketch("k", 0.01, 0.99, 1)
    val bos = new java.io.ByteArrayOutputStream(); cms.writeTo(bos)
    val est = Seq(7).toDF("k")
      .select(SketchExpressions.cmsEstimate($"k", bos.toByteArray).as("e"))
      .head().getLong(0)
    assert(est >= 2L)
  }
}
