package graft.tools

import graft.core.Graph
import graft.ingest.PageGen
import org.apache.spark.sql.SparkSession

/** Standalone BFS throughput probe — the bench's BFS section in isolation
  * (same graph, same action), for iterating on [[graft.operators.Bfs]]
  * without paying a full bench run. `SPARK_GRAFT_PAIR_NODES` sizes the
  * graph (default 4M, the bench's pair graph).
  */
object BfsBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nodes = sys.env.getOrElse("SPARK_GRAFT_PAIR_NODES", "4000000").toLong
    val spark = graft.core.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-bfs-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"/tmp/graft_bench_edges_$nodes"
    if (!new java.io.File(path, "_SUCCESS").exists())
      PageGen.edges(spark, nodes).write.mode("overwrite").parquet(path)
    val g = Graph.fromEdges(spark.read.parquet(path))
    g.adjacency.count()
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val reached = graft.operators.Bfs.run(g, Seq(0L)).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"BFSBENCH run$r nodes=$nodes reached=$reached wallSec=$wall%.2f nodesPerSec=${(reached / wall).round}")
    }
    spark.stop()
  }
}
