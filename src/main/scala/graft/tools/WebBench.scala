package graft.tools

import graft.core.{Graph, Sessions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone replay of the reference's cross-implementation benchmark
  * (`/root/reference/benchmark.py:80-107`: tarjan, SumSweep
  * RADIUS_DIAMETER, HyperBall log2m=6 per BV web graph) on the decoded
  * cnr-2000 blobs — the source of the BASELINE.md real-web-graph table
  * and the sizing data for graft.Bench's budget-guarded section 6.
  *
  * Run: `sbt -batch "runMain graft.tools.WebBench [basename] [cores] [ops]"`
  * where ops ⊆ "tarjan,diameter,hyperball" (default: tarjan,hyperball —
  * EXACT SumSweep diameter certification on cnr-2000 is latency-bound at
  * tens of minutes on local[32]: ~50 BFS levels per sweep × a batched
  * sweep per adaptive step, each level a fixed-cost Spark job; opt in
  * explicitly and expect a wait).
  */
object WebBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val base = args.headOption.getOrElse("/root/reference/tests/graphs/cnr-2000")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val ops = args.lift(2).getOrElse("tarjan,hyperball").split(",").map(_.trim).toSet
    val spark = Sessions.tuned(SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-webbench")
      .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      var t = System.nanoTime()
      def lap(): Double = { val s = (System.nanoTime() - t) / 1e9; t = System.nanoTime(); s }

      val edges = graft.ingest.BvGraphReader.edges(base)
      val df = spark.createDataFrame(spark.sparkContext.parallelize(edges.toSeq, cores))
        .toDF("src", "dst")
      val g = Graph.fromEdges(df)
      g.adjacency.count()
      val loadSec = lap()

      val parts = scala.collection.mutable.ArrayBuffer(
        s""""graph":"${new java.io.File(base).getName}"""",
        s""""arcs":${edges.length}""",
        s""""cores":$cores""",
        f""""loadSec":$loadSec%.2f""")
      lap()
      if (ops("tarjan")) {
        val sccs = graft.operators.Scc.run(g)
          .agg(countDistinct(col("comp"))).head().getLong(0)
        parts += f""""tarjanSec":${lap()}%.2f"""
        parts += s""""sccs":$sccs"""
      }
      if (ops("diameter")) {
        // Latency-bound op: the wall is (BFS levels per sweep) × (number
        // of batched sweeps) × per-level job cost, so a bigger sweep
        // state budget (more sources per batched sweep → fewer sweeps)
        // trades executor memory for driver-side level latency.
        // SPARK_GRAFT_ESS_STATE_ROWS overrides (default here 500M rows,
        // ~10× the operator default — sized for a dedicated local[32]).
        val stateRows = sys.env.getOrElse("SPARK_GRAFT_ESS_STATE_ROWS", "500000000").toLong
        val r = graft.operators.SumSweep.compute(
          g, graft.operators.SumSweep.Output.RadiusDiameter,
          stateBudgetRows = stateRows)
        parts += f""""diameterSec":${lap()}%.2f"""
        parts += s""""radius":${r.radius},"diameter":${r.diameter},"essIterations":${r.iterations}"""
      }
      if (ops("hyperball")) {
        val hb = graft.operators.HyperBall.run(g, log2m = 6, maxIter = 200)
        hb.stats.select(sum(col("reachable"))).head()
        parts += f""""hyperballSec":${lap()}%.2f"""
        parts += s""""hyperballIters":${hb.iterations}"""
      }
      println("WEBBENCH " + parts.mkString("{", ",", "}"))
    } finally spark.stop()
  }
}
