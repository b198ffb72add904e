package graft.ingest

import graft.TestSpark
import graft.core.Graph
import graft.operators.{HyperBall, Scc}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Replays the reference's REAL-web-graph goldens on cnr-2000, decoded
  * from the BV blobs bundled with the reference test suite
  * (`/root/reference/tests/graphs/cnr-2000.*` — plain BVGraph v0, public
  * format, decoded by [[BvGraphReader]]):
  *
  *  - graph shape: 325,557 nodes / 3,216,152 arcs, and the bundled
  *    transpose decodes to EXACTLY the arc-reversed edge set;
  *  - SCC: exactly 100,977 components (`tests/test_sccs.rs:213-226`),
  *    via BOTH the distributed FB-Trim and the driver-exact Tarjan —
  *    two unrelated algorithms agreeing with the pinned Rust/Java count;
  *  - HyperBall centralities vs the bundled Java-HyperBall goldens
  *    (log2m=8, Jenkins seed 42, rel 1e-6 — `tests/test_hyperball.rs:
  *    221-302`, f32-BE arrays under `tests/hyperball_results`), covered
  *    by [[HyperBallGoldenSpec]] (its own suite: ~2 min of runtime that
  *    should not serialize behind this one in a parallel test run).
  *
  * Tests cancel (not fail) if the reference checkout is absent.
  */
class BvGraphGoldenSpec extends AnyFunSuite {
  import BvGraphGolden._

  test("cnr-2000 decodes to 325,557 nodes / 3,216,152 arcs and matches its bundled transpose") {
    assume(available, s"reference graphs not present at $Basename")
    val adj = forward
    val tAdj = backward
    assert(adj.length == 325557 && tAdj.length == 325557)
    assert(adj.iterator.map(_.length.toLong).sum == 3216152L)
    assert(tAdj.iterator.map(_.length.toLong).sum == 3216152L)
    // The transpose blob must be EXACTLY the arc-reversed graph: encode
    // each arc of both edge sets as src<<19|dst (2^19 > 325557) and
    // compare the sorted multisets.
    def keys(a: Array[Array[Int]], reversed: Boolean): Array[Long] = {
      val out = new Array[Long](a.iterator.map(_.length).sum)
      var k = 0
      for (x <- a.indices; y <- a(x)) {
        out(k) = if (reversed) (y.toLong << 19) | x else (x.toLong << 19) | y
        k += 1
      }
      java.util.Arrays.sort(out)
      out
    }
    assert(java.util.Arrays.equals(keys(adj, reversed = false), keys(tAdj, reversed = true)),
      "cnr-2000-t is not the exact arc reversal of cnr-2000")
  }

  test("cnr-2000 has exactly 100,977 SCCs (reference golden) — FB-Trim and driver Tarjan agree") {
    assume(available, s"reference graphs not present at $Basename")
    val spark = TestSpark.spark

    // Driver-exact Tarjan on the decoded adjacency (int-array based —
    // no 3.2M boxed tuples).
    val edges = BvGraphReader.edges(Basename)
    assert(Scc.tarjanMap(edges.toSeq).values.toSet.size == 100977)

    // Distributed FB-Trim over the same edges; localFinishEdges kept at
    // its production default (the tail of ~100k tiny SCCs is exactly
    // the hybrid-finish case the operator is designed for).
    val df = spark.createDataFrame(spark.sparkContext.parallelize(edges.toSeq, 16))
      .toDF("src", "dst")
    val comps = Scc.run(Graph.fromEdges(df))
    assert(comps.select(countDistinct(col("comp"))).head().getLong(0) == 100977L)
  }
}

/** Shared decode of the cnr-2000 blobs (lazy, once per test JVM). */
object BvGraphGolden {
  val Basename = "/root/reference/tests/graphs/cnr-2000"
  def available: Boolean = Files.exists(Paths.get(s"$Basename.graph"))
  lazy val forward: Array[Array[Int]] = BvGraphReader.decode(Basename)
  lazy val backward: Array[Array[Int]] = BvGraphReader.decode(s"$Basename-t")

  /** The reference's golden files: raw big-endian f32 arrays, one value
    * per node (`test_hyperball.rs:174-197` read_float_array).
    */
  def golden(name: String): Array[Double] = {
    val bytes = Files.readAllBytes(
      Paths.get(s"/root/reference/tests/hyperball_results/cnr-2000_$name"))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    Array.fill(bytes.length / 4)(bb.getFloat().toDouble)
  }
}

/** The Java-HyperBall golden replay (see [[BvGraphGoldenSpec]] scaladoc).
  * Its own suite so the ~2 min HyperBall run can proceed in parallel
  * with the SCC suite.
  */
class HyperBallGoldenSpec extends AnyFunSuite {
  import BvGraphGolden._

  test("HyperBall on cnr-2000 matches the Java goldens at rel 1e-6 (log2m=8, Jenkins seed 42)") {
    assume(available, s"reference graphs not present at $Basename")
    val spark = TestSpark.spark

    val edges = BvGraphReader.edges(Basename)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(edges.toSeq, 16))
      .toDF("src", "dst")
    val g = Graph.fromEdges(df)
    // threshold=0 → run until no counter changes, like the golden run's
    // run_until_done (test_hyperball.rs:259).
    val res = HyperBall.run(g, log2m = 8, threshold = 0.0, maxIter = 200,
      seed = 42L, jenkinsHash = true)
    assert(res.iterations < 200, "HyperBall did not stabilize")

    val n = forward.length
    val rows = res.stats
      .select("id", "sumDist", "harmonic", "lin", "closeness", "nieminen")
      .collect()
    assert(rows.length == n)
    val actual = Map(
      "sum_of_distances" -> new Array[Double](n),
      "harmonic_centrality" -> new Array[Double](n),
      "lin_centrality" -> new Array[Double](n),
      "closeness_centrality" -> new Array[Double](n),
      "nieminen_centrality" -> new Array[Double](n))
    rows.foreach { r =>
      val id = r.getLong(0).toInt
      actual("sum_of_distances")(id) = r.getDouble(1)
      actual("harmonic_centrality")(id) = r.getDouble(2)
      actual("lin_centrality")(id) = r.getDouble(3)
      actual("closeness_centrality")(id) = r.getDouble(4)
      actual("nieminen_centrality")(id) = r.getDouble(5)
    }

    // The reference's comparator (test_hyperball.rs:199-219): relative
    // when expected != 0, absolute otherwise, strict < 1e-6.
    for ((name, act) <- actual.toSeq.sortBy(_._1)) {
      val exp = golden(name)
      assert(exp.length == n, s"$name golden length ${exp.length} != $n")
      var worst = 0.0
      var worstI = -1
      var i = 0
      while (i < n) {
        val d = math.abs(exp(i) - act(i))
        val rel = if (exp(i) != 0.0) d / math.abs(exp(i)) else d
        if (rel > worst) { worst = rel; worstI = i }
        i += 1
      }
      assert(worst < 1e-6,
        s"$name: node $worstI rel diff $worst (expected ${exp(worstI)}, got ${act(worstI)})")
    }
  }
}
