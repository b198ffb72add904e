package graft

import graft.core.Graph
import graft.operators.PageRank
import org.apache.spark.sql.SparkSession

/** One benchmark leg in a clean JVM (spawned by [[Bench]] so GC debris
  * from one parallelism level can never distort the next — measured
  * same-JVM contamination: 8-core leg 24 s/iter after a 2-core leg vs
  * 15 s/iter fresh). Prints exactly one line:
  * `BENCHONE {"edges":…,"secPerIter":…,"totalSec":…,"iters":…,"converged":…}`
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON line is regex-parsed by Bench
    val Array(coresS, partsS, edgesPath, mode, arg) = args
    val spark = graft.core.Sessions.tuned(SparkSession.builder()
      .master(s"local[$coresS]")
      .appName(s"graft-benchone-$coresS")
      .config("spark.sql.shuffle.partitions", partsS))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val g = Graph.fromEdges(spark.read.parquet(edgesPath))
      g.adjacency.count()
      val t0 = System.nanoTime()
      val res = mode match {
        case "fixed" => PageRank.run(g, tol = 0.0, maxIter = arg.toInt)
        case "conv" => PageRank.run(g, tol = arg.toDouble, maxIter = 100)
      }
      res.ranks.count()
      val totalSec = (System.nanoTime() - t0) / 1e9
      val steady = res.history.drop(1).map(_.wallMs).sorted
      val medianMs =
        if (steady.isEmpty) res.history.map(_.wallMs).max.toDouble
        else steady(steady.length / 2).toDouble
      // Lower envelope: hypervisor steal / co-tenant contention only ever
      // ADD wall time, so the fastest steady iteration is the
      // interference-robust per-iteration estimate (the median is
      // corrupted wholesale when a steal wave spans most of a short leg).
      val minMs =
        if (steady.isEmpty) medianMs else steady.head.toDouble
      println(f"""BENCHONE {"edges":${g.numEdges},"secPerIter":${medianMs / 1000.0}%.3f,"secPerIterMin":${minMs / 1000.0}%.3f,"totalSec":$totalSec%.2f,"iters":${res.iterations},"converged":${res.converged}}""")
    } finally spark.stop()
  }
}
