package graft.tools

import graft.ingest.PageGen
import org.apache.spark.sql.SparkSession

/** Scratch: generate the deterministic bench edge table at a given size. */
object GenEdges {
  def main(args: Array[String]): Unit = {
    val nodes = args(0).toLong
    val spark = graft.core.Sessions.tuned(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = s"/tmp/graft_bench_edges_$nodes"
    if (!new java.io.File(path, "_SUCCESS").exists())
      PageGen.edges(spark, nodes).write.mode("overwrite").parquet(path)
    println(s"[gen] $path done")
    spark.stop()
  }
}
