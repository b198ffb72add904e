package graft.tools

/** Plan-capture aid for the optimization rounds: write the
  * `.explain("formatted")` output of selected driver-contract queries to
  * `plans/<tag>/<query>_<suffix>.txt` —
  * `sbt "runMain graft.tools.ExplainQ r06 before g_cc_incr d_containment"`.
  *
  * The plan is captured WITHOUT executing the query (explain only), in a
  * session configured exactly like the bench's query section
  * (local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus), so the Exchange
  * count / join strategy in the file is what the bench pays.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainQ <tag> <suffix> <query>...")
    val tag = args(0)
    val suffix = args(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.tuned(org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new java.io.File(s"plans/$tag")
    out.mkdirs()
    for (q <- args.drop(2)) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val f = new java.io.File(out, s"${q}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(plan) finally w.close()
      println(s"EXPLAINQ $q -> ${f.getPath} (${plan.count(_ == '\n')} lines)")
    }
    spark.stop()
  }
}
