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
  * Run: `sbt -batch "runMain graft.tools.WebBench [basename] [cores]"`.
  */
object WebBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val base = args.headOption.getOrElse("/root/reference/tests/graphs/cnr-2000")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
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

      val sccs = graft.operators.Scc.run(g)
        .agg(countDistinct(col("comp"))).head().getLong(0)
      val tarjanSec = lap()

      val r = graft.operators.SumSweep.compute(
        g, graft.operators.SumSweep.Output.RadiusDiameter)
      val diameterSec = lap()

      val hb = graft.operators.HyperBall.run(g, log2m = 6, maxIter = 200)
      hb.stats.select(sum(col("reachable"))).head()
      val hyperballSec = lap()

      println(f"""WEBBENCH {"graph":"${new java.io.File(base).getName}","arcs":${edges.length},"cores":$cores,"loadSec":$loadSec%.2f,"tarjanSec":$tarjanSec%.2f,"sccs":$sccs,"diameterSec":$diameterSec%.2f,"radius":${r.radius},"diameter":${r.diameter},"hyperballSec":$hyperballSec%.2f,"hyperballIters":${hb.iterations}}""")
    } finally spark.stop()
  }
}
