package graft.tools

import graft.core.Graph
import graft.ingest.PageGen
import graft.operators.PageRank
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Diagnostic: per-superstep wall times for PageRank + exchange count of a
  * representative steady-state superstep plan (should be 1: the gather).
  */
object PrDebug {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val smj = sys.env.getOrElse("SPARK_GRAFT_SMJ", "false")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "320000").toLong
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cores.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.join.preferSortMergeJoin", smj)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG","WARN"))
    import spark.implicits._

    val g = Graph.fromEdges(PageGen.edges(spark, n))
    g.adjacency.count()
    val verboseRun = sys.env.getOrElse("SPARK_GRAFT_VERBOSE", "true").toBoolean
    val t0 = System.nanoTime()
    val res = PageRank.run(g, tol = 0.0, maxIter = 10, verbose = verboseRun)
    res.ranks.count()
    println(f"total ${(System.nanoTime() - t0) / 1e9}%.2fs for ${res.iterations} iters " +
      f"(${g.numEdges * res.iterations / ((System.nanoTime() - t0) / 1e9)}%.0f edges/s/iter)")

    // Reconstruct one steady-state superstep plan to count exchanges.
    val verts = g.outDegrees.repartition(col("id")).persist(StorageLevel.MEMORY_AND_DISK)
    verts.count()
    val state = verts.select($"id", lit(1.0).as("rank")).persist(StorageLevel.MEMORY_AND_DISK)
    state.count()
    val contribs = g.adjacency
      .join(state.select($"id".as("src"), $"rank"), Seq("src"))
      .select(explode($"dsts").as("id"), ($"rank" / $"deg").as("c"))
      .groupBy($"id").agg(sum($"c").as("contrib"))
    val next = verts.join(contribs, Seq("id"), "left")
      .select($"id", (lit(0.1) + lit(0.85) * coalesce($"contrib", lit(0.0))).as("rank"), $"deg")
    val stats = next.join(state.select($"id", $"rank".as("prevRank")), Seq("id"))
      .agg(sum(abs($"rank" - $"prevRank")))
    val plan = stats.queryExecution.executedPlan.toString
    println(s"=== exchanges in superstep+stats plan: ${"Exchange".r.findAllIn(plan).length} ===")
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("Sort ")).mkString("\n"))
    spark.stop()
  }
}
