package graft.core

import graft.{Fixtures, SeqOracles, TestSpark}
import graft.operators.{ConnectedComponents, PageRank}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class TableIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("commit/latest round-trips data, manifest has per-partition lineage") {
    val dir = Files.createTempDirectory("graft-tio").toString
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "x").repartition(4)
    val m = TableIO.commit(df, dir, iteration = 3, Map("deltaNorm" -> 0.5))
    assert(m.snapshot == 0 && m.iteration == 3 && m.rowCount == 100)
    assert(m.partitions.nonEmpty && m.partitions.map(_.rowCount).sum == 100)
    assert(m.metrics("deltaNorm") == 0.5)
    val (m2, got) = TableIO.latest(spark, dir).get
    assert(m2.iteration == 3)
    assert(got.as[(Long, Double)].collect().toSet == (1L to 100L).map(i => (i, i * 2.0)).toSet)
    // second commit becomes the new latest
    TableIO.commit(df.limit(10), dir, iteration = 4, Map.empty)
    assert(TableIO.latest(spark, dir).get._1.iteration == 4)
  }

  test("validation fails loudly on tampered data") {
    val dir = Files.createTempDirectory("graft-tio2").toString
    TableIO.commit((1L to 50L).toDF("id"), dir, 1, Map.empty)
    // tamper: delete a data file
    val snapDir = java.nio.file.Paths.get(dir, "snapshot=00000")
    Files.list(snapDir).iterator().forEachRemaining { p =>
      if (p.toString.endsWith(".parquet")) Files.delete(p)
    }
    assertThrows[Exception](TableIO.latest(spark, dir))
  }
}

class CheckpointResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("CC resumes mid-iteration from checkpoint and matches oracle") {
    val edges = Fixtures.erdosRenyi(60, 0.03, 5)
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val cfg = Some(CheckpointConfig(dir, every = 1))
    // Phase 1: run only 2 supersteps (simulated interruption).
    val partial = ConnectedComponents.run(Graph.fromPairs(spark, edges), maxIter = 2, checkpoint = cfg)
    assert(partial.iterations == 2)
    assert(TableIO.latestSnapshotId(dir).exists(_ >= 1))
    // Phase 2: fresh invocation resumes from snapshot and completes.
    val resumed = ConnectedComponents.run(Graph.fromPairs(spark, edges), maxIter = 200, checkpoint = cfg)
    assert(resumed.iterations > 2) // continued past the resumed iteration
    val got = resumed.components.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == SeqOracles.cc(edges))
    // Manifests carry the iteration metrics required by the north rule.
    val m = TableIO.readManifest(dir, TableIO.latestSnapshotId(dir).get)
    assert(m.metrics.keySet == Set("deltaNorm", "messages", "changed", "skewRatio"))
  }

  test("PageRank checkpointed run equals un-checkpointed run") {
    val edges = Fixtures.erdosRenyi(50, 0.06, 9)
    val dir = Files.createTempDirectory("graft-ckpt-pr").toString
    val plain = PageRank.run(Graph.fromPairs(spark, edges), tol = 1e-8, maxIter = 60)
    val ck = PageRank.run(Graph.fromPairs(spark, edges), tol = 1e-8, maxIter = 60,
      checkpoint = Some(CheckpointConfig(dir, every = 2)))
    val a = plain.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = ck.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (v, r) => assert(math.abs(r - b(v)) < 1e-12) }
  }

  test("advance never releases caller-owned checkpoints embedded in the init state") {
    // Regression (i_host_rank): the init state's plan embeds a checkpoint
    // the CALLER still needs after the loop (DenseIds host map joined back
    // onto the ranks). Superseding the init state must drop only its own
    // persist — walking its plan with Lineage.release would unpersist the
    // caller's blocks and make any later read fail with
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val callerOwned = Seq((1L, "x"), (2L, "y")).toDF("id", "tag").localCheckpoint(true)
    val ctx = new IterationContext("release-guard")
    val st0 = ctx.init(callerOwned.select($"id", lit(0L).as("v")))
    val next = ctx.cut(st0.select($"id", ($"v" + 1).as("v")))
    next.count()
    ctx.advance(1, next, deltaNorm = 1.0, messages = 2, changed = 2)
    ctx.close()
    // The caller's checkpoint must still be readable.
    assert(callerOwned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
