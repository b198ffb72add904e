package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("differential vs brute force, intervals spanning bins, boundary inclusivity") {
    val rnd = new scala.util.Random(13)
    // intervals up to 3.5 bins wide (binWidth 100) at arbitrary offsets
    val lrows = (0 until 200).map { i =>
      val lo = rnd.nextInt(2000).toLong - 500
      (i.toLong, rnd.nextInt(6).toLong, lo, lo + rnd.nextInt(350).toLong)
    }
    val rrows = (0 until 300).map { j =>
      (j.toLong, rnd.nextInt(6).toLong, rnd.nextInt(2000).toLong - 500)
    }
    val got = RangeJoin.pointInInterval(
        lrows.toDF("lid", "k", "lo", "hi"), rrows.toDF("rid", "rk", "t"),
        "k", "rk", "lo", "hi", "t", binWidth = 100L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (lid, k, lo, hi) <- lrows
      (rid, rk, t) <- rrows
      if k == rk && t >= lo && t <= hi
    } yield (lid, rid)).toSet
    assert(got == want, s"got ${got.size} want ${want.size}")
    // each pair exactly once (Set above would hide dups — recount)
    val n = RangeJoin.pointInInterval(
        lrows.toDF("lid", "k", "lo", "hi"), rrows.toDF("rid", "rk", "t"),
        "k", "rk", "lo", "hi", "t", binWidth = 100L).count()
    assert(n == want.size)
  }

  test("exact bin-edge points and degenerate single-point intervals") {
    val l = Seq((1L, 0L, 100L, 200L), (2L, 0L, 150L, 150L)).toDF("lid", "k", "lo", "hi")
    val r = Seq((10L, 0L, 100L), (11L, 0L, 200L), (12L, 0L, 150L), (13L, 0L, 201L))
      .toDF("rid", "rk", "t")
    val got = RangeJoin.pointInInterval(l, r, "k", "rk", "lo", "hi", "t", 100L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L)))
  }

  test("inverted intervals and nulls match nothing; key isolation holds") {
    val l = Seq(
      (1L, Option(0L), Option(200L), Option(100L)), // hi < lo
      (2L, None, Option(0L), Option(300L)),          // null key
      (3L, Option(1L), Option(0L), Option(300L))     // wrong key
    ).toDF("lid", "k", "lo", "hi")
    val r = Seq((10L, Option(0L), Option(150L)), (11L, Option(0L), Option.empty[Long]))
      .toDF("rid", "rk", "t")
    val got = RangeJoin.pointInInterval(l, r, "k", "rk", "lo", "hi", "t", 50L).count()
    assert(got == 0)
  }

  test("maxBins guard: a sentinel interval cannot kill the job, and the drop is auditable") {
    // ADVICE r3: hi = Long.MaxValue would make sequence() exceed Spark's
    // max array length and fail the whole job at runtime
    val l = Seq((1L, 0L, 100L, 200L), (2L, 0L, 0L, Long.MaxValue))
      .toDF("lid", "k", "lo", "hi")
    val r = Seq((10L, 0L, 150L)).toDF("rid", "rk", "t")
    val got = RangeJoin.pointInInterval(l, r, "k", "rk", "lo", "hi", "t", binWidth = 100L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L))) // sane row joined; sentinel row excluded, job alive
    val dropped = RangeJoin.oversizedIntervals(l, "k", "lo", "hi", binWidth = 100L)
      .select("lid").collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L))
    // the bound is a parameter: 70001 bins trips the default 2^16, not 2^17
    val wide = Seq((3L, 0L, 0L, 100L * 70000L)).toDF("lid", "k", "lo", "hi")
    assert(RangeJoin.oversizedIntervals(wide, "k", "lo", "hi", 100L).count() == 1)
    assert(RangeJoin.oversizedIntervals(wide, "k", "lo", "hi", 100L, maxBins = 1L << 17).count() == 0)
  }

  test("binWidth=1 with full-long sentinel bounds: guard itself cannot overflow") {
    // The r4 code-review find: a long-typed bin(hi) - bin(lo) wraps for
    // (Long.MinValue, Long.MaxValue) at binWidth=1, letting the sentinel
    // THROUGH the guard (legacy) or killing the job in the guard (ANSI).
    // The double-typed guard must drop it — and a sane row still joins.
    val l = Seq((1L, 0L, 100L, 200L), (2L, 0L, Long.MinValue, Long.MaxValue))
      .toDF("lid", "k", "lo", "hi")
    val r = Seq((10L, 0L, 150L)).toDF("rid", "rk", "t")
    val got = RangeJoin.pointInInterval(l, r, "k", "rk", "lo", "hi", "t", binWidth = 1L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
    val dropped = RangeJoin.oversizedIntervals(l, "k", "lo", "hi", binWidth = 1L)
      .select("lid").collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L))
    // A sentinel-magnitude right POINT is likewise dropped, not fatal.
    val rBad = Seq((10L, 0L, 150L), (11L, 0L, Long.MaxValue)).toDF("rid", "rk", "t")
    val got2 = RangeJoin.pointInInterval(l, rBad, "k", "rk", "lo", "hi", "t", binWidth = 1L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got2 == Set(10L))
  }

  test("binWidth > 1 near Long.MinValue: pmod-subtract cannot underflow") {
    // Second-round review find: `c - pmod(c, w)` underflows for c within
    // w of Long.MinValue when w > 1 (binWidth=1 has pmod=0 and hides
    // it). rangeEvents' hour-in-micros width is the realistic case.
    val w = 3600000000L
    val l = Seq(
      (1L, 0L, 100L, 200L),
      (2L, 0L, Long.MinValue, Long.MinValue + 10L), // sentinel bounds
      (3L, 0L, Long.MinValue, Long.MaxValue)
    ).toDF("lid", "k", "lo", "hi")
    val r = Seq((10L, 0L, 150L), (11L, 0L, Long.MinValue + 5L)).toDF("rid", "rk", "t")
    val got = RangeJoin.pointInInterval(l, r, "k", "rk", "lo", "hi", "t", binWidth = w)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L))) // sane pair only; no overflow, no garbage match
    val dropped = RangeJoin.oversizedIntervals(l, "k", "lo", "hi", binWidth = w)
      .select("lid").collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L, 3L)) // the audit face sees BOTH sentinels
  }

  test("plan: equi-join on (key, bin), no nested-loop/cartesian") {
    val l = Seq((1L, 0L, 100L, 200L)).toDF("lid", "k", "lo", "hi")
    val r = Seq((10L, 0L, 100L)).toDF("rid", "rk", "t")
    val plan = RangeJoin.pointInInterval(l, r, "k", "rk", "lo", "hi", "t", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
