package graft.core

import graft.{Fixtures, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withTable(name: String)(body: => Unit): Unit =
    try body finally spark.sql(s"DROP TABLE IF EXISTS $name")

  test("bucketed write/read round-trips the edge set deduplicated") {
    import spark.implicits._
    withTable("bkt_rt") {
      val raw = (Fixtures.bucket9 ++ Fixtures.bucket9).toDF("src", "dst") // dups
      Bucketed.writeEdges(raw, "bkt_rt", buckets = 4)
      val got = Bucketed.edges(spark, "bkt_rt")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Fixtures.bucket9.toSet)
    }
  }

  test("state join and degree aggregation run with no edge-side exchange") {
    import spark.implicits._
    withTable("bkt_join") {
      Bucketed.writeEdges(
        Fixtures.erdosRenyi(200, 0.05, 23).toDF("src", "dst"), "bkt_join", buckets = 4)
      val e = Bucketed.edges(spark, "bkt_join")

      // Degree aggregation: bucket partitioning satisfies the groupBy
      // distribution — zero Exchange nodes.
      val degs = e.groupBy($"src").agg(count(lit(1)))
      degs.collect()
      val aggPlan = degs.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"degree agg over the bucketed table shuffled:\n$aggPlan")

      // State join: force a shuffle join (broadcast would hide the
      // question) — exactly ONE exchange, on the state side.
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val state = spark.range(0, 200).select($"id".as("src"), rand(7).as("rank"))
        val j = e.join(state, Seq("src"))
        j.collect()
        // AQE's toString prints the plan twice (Final + Initial): count
        // exchanges in the FINAL section only.
        val plan = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        val exchanges = "Exchange".r.findAllIn(plan).size
        assert(exchanges == 1,
          s"expected exactly the state-side exchange, found $exchanges:\n$plan")
        assert(plan.contains("Bucketed: true"),
          s"edge side did not read as a bucketed scan:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }

  test("writeEdges overwrites stale managed files left by a dead session") {
    import spark.implicits._
    // Simulate an unclean exit: files exist at the managed location but
    // the (session-scoped) catalog has no entry — the CREATE path would
    // throw LOCATION_ALREADY_EXISTS without the overwrite cleanup.
    val loc = new java.io.File(new java.net.URI(
      spark.sessionState.catalog
        .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier("bkt_stale"))
        .toString))
    loc.mkdirs()
    java.nio.file.Files.writeString(loc.toPath.resolve("stale.parquet"), "junk")
    withTable("bkt_stale") {
      Bucketed.writeEdges(Fixtures.bucket9.toDF("src", "dst"), "bkt_stale", buckets = 2)
      val got = Bucketed.edges(spark, "bkt_stale")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Fixtures.bucket9.toSet)
    }
  }

  test("a writeEdges call that fails analysis leaves the existing table intact") {
    import spark.implicits._
    withTable("bkt_safe") {
      Bucketed.writeEdges(Fixtures.bucket9.toDF("src", "dst"), "bkt_safe", buckets = 2)
      // Missing `dst` column: must fail BEFORE the drop/delete, so the
      // previous table survives (second-round review find — the
      // destructive steps used to run before the input was analyzed).
      intercept[Exception] {
        Bucketed.writeEdges(Seq(1L).toDF("src"), "bkt_safe", buckets = 2)
      }
      val got = Bucketed.edges(spark, "bkt_safe")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Fixtures.bucket9.toSet)
    }
  }

  test("attach re-registers external files with bucketing intact (the new-session path)") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("graft-bkt-ext").toString
    withTable("bkt_ext") {
      Bucketed.writeEdges(Fixtures.erdosRenyi(120, 0.06, 41).toDF("src", "dst"),
        "bkt_ext", buckets = 4, path = Some(loc))
      val before = Bucketed.edges(spark, "bkt_ext").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // Simulate a fresh session's empty catalog: external drop keeps files.
      spark.sql("DROP TABLE bkt_ext")
      Bucketed.attach(spark, "bkt_ext", loc, buckets = 4)
      val e = Bucketed.edges(spark, "bkt_ext")
      assert(e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == before)
      // ... and the re-attached table still aggregates with no exchange.
      val degs = e.groupBy($"src").agg(count(lit(1)))
      degs.collect()
      val plan = degs.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"re-attached table lost its bucketing metadata:\n$plan")
    }
  }

  test("fromBucketed adjacency equals fromEdges adjacency and builds with no exchange") {
    import spark.implicits._
    withTable("bkt_adj") {
      val pairs = Fixtures.erdosRenyi(150, 0.06, 31)
      Bucketed.writeEdges(pairs.toDF("src", "dst"), "bkt_adj", buckets = 4)
      val gB = Graph.fromBucketed(spark, "bkt_adj", chunkSize = 8)
      val gE = Graph.fromPairs(spark, pairs, chunkSize = 8)
      def chunks(g: Graph) = g.adjacency.collect()
        .map(c => (c.src, c.deg, c.chunk, c.dsts.toSeq)).toSet
      assert(chunks(gB) == chunks(gE))
      val plan = gB.adjacency.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed adjacency build still shuffles:\n$plan")
      // And the raw-edge build DOES need its exchange (the assertion
      // above is meaningful).
      val rawPlan = gE.adjacency.queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange"))
      gB.unpersist(); gE.unpersist()
    }
  }
}
