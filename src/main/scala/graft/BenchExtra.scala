package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmarks for the optimization rounds (guide §1.4) — NOT part of
  * the frozen driver contract ([[Bench]] is hashed; this main is additive).
  *
  * Times each named driver-contract query with the NOOP SINK
  * (`df.write.format("noop")`), which computes every column of every row,
  * instead of [[Bench]]'s `count()` (which lets the optimizer prune).
  * Jobs are labeled per query so event logs / UI attribute work correctly.
  *
  * `sbt "runMain graft.BenchExtra g_cc_incr d_containment"` — or no args
  * for the full alphabetical list. Prints one `BENCHX <name> <sec>` line
  * per query and a final JSON summary line.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = graft.core.Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (q <- names) {
      spark.sparkContext.setJobDescription(s"benchx:$q")
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      times(q) = sec
      println(f"BENCHX $q $sec%.2f s")
    }
    spark.sparkContext.setJobDescription(null)
    val body = times.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(f"""{"metric":"benchx_noop","unit":"sec","sf":"$dir","queries":{$body}}""")
    spark.stop()
  }
}
