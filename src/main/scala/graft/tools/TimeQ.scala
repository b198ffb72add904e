package graft.tools

/** Local iteration aid: time selected driver-contract queries at an sf
  * dir (`SPARK_GRAFT_SF_DIR`, default sf0.1) in one warm session —
  * `sbt "runMain graft.tools.TimeQ g_cc_incr g_pagerank5"`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.tuned(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"TIMEQ $q ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
    }
    spark.stop()
  }
}
