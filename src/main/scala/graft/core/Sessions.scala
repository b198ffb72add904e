package graft.core

/** Shared session-tuning knobs for the engine's own entry points. */
object Sessions {

  /** Fast scratch for shuffle/spill files.
    *
    * On a real cluster every executor brings its own local disks, so
    * shuffle I/O bandwidth scales WITH executor count; a single box has
    * one shared disk — contention a cluster would not have, and it was
    * the round-2 scaling-leg bottleneck (local[8] PageRank measured
    * 6.27 → 3.36 s/iter moving spark.local.dir to tmpfs). Use /dev/shm
    * when present so the in-sandbox scaling proxy measures the engine,
    * not one disk.
    */
  def scratchDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-scratch")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }

  /** Apply the engine defaults shared by Verify/Bench/Smoke sessions. */
  def tuned(b: org.apache.spark.sql.SparkSession.Builder): org.apache.spark.sql.SparkSession.Builder =
    b.config("spark.local.dir", scratchDir)
      // graft's native expressions as SQL functions (hll_*, vec_*)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Shuffle files of superseded superstep RDDs are only deleted when
      // the RDD objects are GC'd; the default 30-min periodic GC lets
      // them pile up in tmpfs on long iterative runs. 60s was the round-2
      // setting; under ParallelGC each tick is a full STW collection of
      // the whole heap (measured: 10-20 s pauses landing inside query
      // stages — event-log stage 179 spent 722 s of task-attributed GC
      // against 8.9 s of CPU), so the default is now 300s and
      // env-overridable for the tmpfs-pressure bench paths.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "300s"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.join.preferSortMergeJoin", "false") // per-superstep SMJ re-sorts measured 3.5x slower than SHJ
      .config("spark.sql.session.timeZone", "UTC")
      // Bucketed-table storage ([[Bucketed]]) lands in scratch, not the
      // process working directory (the default ./spark-warehouse).
      .config("spark.sql.warehouse.dir", s"$scratchDir/warehouse")
      .config("spark.ui.enabled", "false")
}
