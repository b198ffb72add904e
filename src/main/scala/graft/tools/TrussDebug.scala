package graft.tools

import org.apache.spark.sql.functions._

/** Local diagnostics for the k-truss peel: per-round deletion counts and
  * wall times of the incremental path vs a full-recount round, on the
  * gate's truss graph at an sf dir. `sbt "runMain graft.tools.TrussDebug [sfDir]"`.
  */
object TrussDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.tuned(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("l_partkey % 1201 AS src",
        "(l_partkey * 37 + l_suppkey * 11 + l_linenumber) % 1201 AS dst")
      .distinct()
    val g = graft.core.Graph.fromEdges(edges)

    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"TRUSSDEBUG $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }

    val und = g.edges.filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct().toDF().localCheckpoint(true)
    println(s"TRUSSDEBUG edges=${und.count()} nodes=${und.select(explode(array($"u", $"v"))).distinct().count()}")
    lap("canonicalize")

    var st = graft.operators.TriangleCount.supportOfCanonical(und).localCheckpoint(true)
    println(s"TRUSSDEBUG support rows=${st.count()}")
    lap("initial-support")

    var round = 0
    var done = false
    while (!done && round < 12) {
      round += 1
      val del = st.filter($"support" < 2L).count()
      val tot = st.count()
      println(s"TRUSSDEBUG round $round toDelete=$del total=$tot")
      if (del == 0) { done = true }
      else {
        val next = graft.operators.TriangleCount
          .supportOfCanonical(st.filter($"support" >= 2L).select($"u", $"v").localCheckpoint(true))
          .localCheckpoint(true)
        next.count()
        lap(s"recount-round-$round")
        st = next
      }
    }

    val t1 = System.nanoTime()
    val r = graft.operators.KTruss.run(g, k = 4)
    println(s"TRUSSDEBUG incremental truss rows=${r.truss.count()} rounds=${r.rounds}")
    println(f"TRUSSDEBUG incremental-total ${(System.nanoTime() - t1) / 1e9}%.2f s")

    // --- web-shaped graph WITH a real cascade: PageGen topology ---------
    val webN = args.lift(1).map(_.toLong).getOrElse(400000L)
    val webG = graft.core.Graph.fromEdges(graft.ingest.PageGen.edges(spark, webN))
    val wund = webG.edges.filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct().toDF().localCheckpoint(true)
    println(s"TRUSSDEBUG web edges=${wund.count()}")
    t0 = System.nanoTime()
    // full-recount peel (the pre-round-5 shape)
    var wst = wund
    var prev = -1L
    var wr = 0
    var cur = wst.count()
    while (cur != prev && cur > 0 && wr < 40) {
      prev = cur
      wst = graft.operators.TriangleCount.supportOfCanonical(wst)
        .filter($"support" >= 1L).select($"u", $"v").localCheckpoint(true)
      cur = wst.count()
      if (cur != prev) wr += 1
    }
    println(f"TRUSSDEBUG web recount-peel k=3 rounds=$wr survivors=$cur ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val wres = graft.operators.KTruss.run(webG, k = 3)
    println(f"TRUSSDEBUG web incremental k=3 rounds=${wres.rounds} survivors=${wres.truss.count()} ${(System.nanoTime() - t0) / 1e9}%.2f s history=${wres.history.map(_.wallMs).mkString(",")}")
    spark.stop()
  }
}
