package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed persistent edge storage — the engine's stand-in for the
  * north-rule's bucketed edge table: `bucketBy(src)` parquet written
  * through the session catalog. Bucketing records the hash partitioning
  * IN THE TABLE METADATA, so any FUTURE session (a restarted job, the
  * next day's run) gets the clustering for free:
  *
  *  - `state ⋈ edges ON src` shuffles ONLY the vertex state — the
  *    bucketed scan satisfies the join's distribution requirement
  *    (Spark's bucket hash is the same Murmur3 the Exchange would use);
  *  - `groupBy(src)` degree/adjacency aggregations run with NO exchange
  *    at all;
  *  - [[Graph.fromBucketed]] assembles the CSR chunk adjacency straight
  *    off the scan — an in-partition sort instead of the
  *    repartition+sort a raw edge file needs. The one-time ingest
  *    shuffle is paid at WRITE time, never again.
  *
  * That is the difference between "re-running an algorithm on a stored
  * 10¹⁰-arc crawl re-shuffles 10¹⁰ rows first" and "it starts computing
  * immediately".
  */
object Bucketed {

  /** Write a deduplicated, src-bucketed, (src,dst)-sorted edge table.
    * `buckets` should be sized so one bucket's arcs fit an executor
    * (at crawl scale: thousands); it is also the max useful parallelism
    * of later scans, exactly like a cluster's fixed partition count.
    *
    * With `path` set, the table is EXTERNAL: the files live at `path`
    * and survive both `DROP TABLE` and the session — the deployment
    * shape, since the default in-memory catalog is session-scoped and a
    * NEW session re-registers the files with [[attach]] (a metastore
    * deployment would skip that step). Without `path` the table is
    * managed in the warehouse dir (convenient for single-session use).
    */
  def writeEdges(edges: DataFrame, table: String, buckets: Int,
                 path: Option[String] = None): Unit = {
    require(buckets > 0)
    requireSimpleName(table)
    val spark = edges.sparkSession
    // Force ANALYSIS of the projected input BEFORE anything destructive:
    // a call with a missing/mistyped column must fail here with the old
    // table still intact, not after the drop below has already deleted
    // it (second-round review find).
    val prepared = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    prepared.schema
    // mode("overwrite") only overwrites when the CATALOG already knows
    // the table. A fresh session whose warehouse still holds a dead
    // session's files takes the CREATE path instead and dies with
    // LOCATION_ALREADY_EXISTS — i.e. the managed default would fail
    // exactly on restart-after-unclean-exit, the scenario this module
    // exists for. Drop any current entry, then clear the target
    // location (destructive by declaration: this method IS overwrite).
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = path.getOrElse(
      spark.sessionState.catalog
        .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .toString)
    val hPath = new org.apache.hadoop.fs.Path(loc)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(hPath)) fs.delete(hPath, true)
    val w = prepared
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, "src")
      .sortBy("src", "dst")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Re-register an existing [[writeEdges]] directory in THIS session's
    * catalog with its bucketing metadata — what makes "write once, any
    * future session joins shuffle-free" true without a persistent
    * metastore: the bucket layout is a property of the files, the
    * catalog entry merely declares it. `buckets` must match the value
    * the files were written with (a mismatch mis-routes the bucket
    * pruning — the caller records it next to the path).
    */
  def attach(spark: SparkSession, table: String, path: String, buckets: Int): Unit = {
    require(buckets > 0)
    requireSimpleName(table)
    // Single quotes in the location are SQL-escaped by doubling — a
    // path like /data/o'brien must not terminate the string literal.
    val loc = path.replace("'", "''")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table (src BIGINT, dst BIGINT)
         |USING parquet
         |CLUSTERED BY (src) SORTED BY (src, dst) INTO $buckets BUCKETS
         |LOCATION '$loc'""".stripMargin)
    ()
  }

  /** Table names are interpolated into SQL and catalog identifiers:
    * restrict to simple identifiers so neither can be broken out of.
    */
  private def requireSimpleName(table: String): Unit =
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table must be a simple identifier, got '$table'")

  /** The stored edge table (deduplicated at write time). */
  def edges(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
