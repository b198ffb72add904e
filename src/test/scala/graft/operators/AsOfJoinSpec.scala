package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leftDf = Seq(
    (1L, 1L, 100L), // matches right t=90 (latest <= 100)
    (2L, 2L, 100L), // exact-tie: right row AT t=100 must match
    (3L, 3L, 100L), // key with no right rows at all
    (4L, 4L, 100L), // right rows exist but all AFTER t=100
    (5L, 5L, 95L)   // multiple right rows, picks t=80 not t=10
  ).toDF("ev", "v", "t")

  private def rightDf = Seq(
    (100L, 1L, 90L), (101L, 1L, 101L),          // 90 visible, 101 not
    (102L, 2L, 100L), (103L, 2L, 99L),          // exact tie at 100 wins
    (104L, 4L, 150L),                           // only-future row
    (105L, 5L, 10L), (106L, 5L, 80L)            // 80 is the latest <= 95
  ).toDF("ok", "k", "ot")

  test("as-of picks the latest right row at or before each left time, per key") {
    // left key renamed to avoid a column-name collision with right's k
    val out = AsOfJoin
      .asOf(leftDf.withColumnRenamed("v", "t_k"), rightDf, "t_k", "k", "t", "ot")
    val m = out.collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(m(1L) == Some(100L)) // right ok=100 (t 90)
    assert(m(2L) == Some(102L)) // the exact-tie row, not the t=99 one
    assert(m(3L) == None)
    assert(m(4L) == None)       // future rows invisible
    assert(m(5L) == Some(106L)) // latest preceding, not earliest
  }

  test("differential vs brute-force on random data (incl. many rows per key)") {
    val rnd = new scala.util.Random(7)
    val lrows = (0 until 300).map(i => (i.toLong, (rnd.nextInt(12)).toLong, rnd.nextInt(1000).toLong))
    // unique (key, time) on the right, as the operator contract requires
    val rrowsMap = scala.collection.mutable.Map[(Long, Long), Long]()
    (0 until 400).foreach { j =>
      rrowsMap(((rnd.nextInt(12)).toLong, rnd.nextInt(1000).toLong)) = j.toLong
    }
    val rrows = rrowsMap.toSeq.map { case ((k, t), id) => (id, k, t) }
    val got = AsOfJoin.asOf(
        lrows.toDF("ev", "lk", "lt"), rrows.toDF("rid", "rk", "rt"),
        "lk", "rk", "lt", "rt")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    lrows.foreach { case (ev, k, t) =>
      val want = rrows.filter(r => r._2 == k && r._3 <= t)
        .sortBy(_._3).lastOption.map(_._1)
      assert(got(ev) == want, s"left row $ev key $k time $t")
    }
  }

  test("tolerance bounds staleness: matches older than t - tol null out") {
    val out = AsOfJoin.asOf(
      leftDf.withColumnRenamed("v", "t_k"), rightDf, "t_k", "k", "t", "ot",
      tolerance = Some(12L))
    val m = out.collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(m(1L) == Some(100L)) // staleness 10 <= 12
    assert(m(2L) == Some(102L)) // exact match, staleness 0
    assert(m(5L) == None)       // best match t=80, staleness 15 > 12
    assert(m(3L) == None && m(4L) == None)
    // boundary inclusive: staleness == tol still matches
    val b = AsOfJoin.asOf(
      leftDf.withColumnRenamed("v", "t_k"), rightDf, "t_k", "k", "t", "ot",
      tolerance = Some(15L))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(b(5L) == Some(106L))
  }

  test("negative tolerance fails fast instead of nulling every match") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(leftDf.withColumnRenamed("v", "t_k"), rightDf,
        "t_k", "k", "t", "ot", tolerance = Some(-1L))
    }
  }

  test("tolerance differential vs brute force") {
    val rnd = new scala.util.Random(19)
    val lrows = (0 until 200).map(i => (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(500).toLong))
    val rrowsMap = scala.collection.mutable.Map[(Long, Long), Long]()
    (0 until 250).foreach { j =>
      rrowsMap((rnd.nextInt(8).toLong, rnd.nextInt(500).toLong)) = j.toLong
    }
    val rrows = rrowsMap.toSeq.map { case ((k, t), id) => (id, k, t) }
    val tol = 25L
    val got = AsOfJoin.asOf(
        lrows.toDF("ev", "lk", "lt"), rrows.toDF("rid", "rk", "rt"),
        "lk", "rk", "lt", "rt", tolerance = Some(tol))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    lrows.foreach { case (ev, k, t) =>
      val want = rrows.filter(r => r._2 == k && r._3 <= t && r._3 >= t - tol)
        .sortBy(_._3).lastOption.map(_._1)
      assert(got(ev) == want, s"left row $ev key $k time $t")
    }
  }

  test("null key / null time on the left never match; right nulls are dropped") {
    val l = Seq(
      (1L, Option(5L), Option(100L)),
      (2L, None, Option(100L)),
      (3L, Option(5L), None)
    ).toDF("ev", "lk", "lt")
    val r = Seq(
      (10L, Option(5L), Option(50L)),
      (11L, Option.empty[Long], Option(40L)),
      (12L, Option(5L), Option.empty[Long])
    ).toDF("rid", "rk", "rt")
    val got = AsOfJoin.asOf(l, r, "lk", "rk", "lt", "rt").collect()
      .map(x => x.getLong(0) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(got.size == 3)           // left rows all survive (left-outer)
    assert(got(1L) == Some(10L))    // normal match; null-time right row invisible
    assert(got(2L) == None && got(3L) == None)
  }

  test("plan: one shuffle on the key, no cartesian/range-join explosion") {
    val plan = AsOfJoin.asOf(leftDf.withColumnRenamed("v", "t_k"), rightDf,
        "t_k", "k", "t", "ot")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // exactly one exchange feeds the window (union legs share it post-AQE
    // coalescing is fine; the point is NO per-pair join node exists)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
  }
}
