package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A directed arc `src -> dst` over dense Long vertex ids.
  *
  * Mirrors the reference's graph abstraction (nodes are dense integer ids,
  * arcs exposed as successor lists — `/root/reference/src/algo/visits/
  * breadth_first/seq.rs:104`), re-expressed as a typed Spark row.
  */
case class Edge(src: Long, dst: Long)

/** CSR-style adjacency chunk: one row per (vertex, chunk-of-successors).
  *
  * The reference stores BV-compressed sorted successor lists per node; our
  * Spark-native equivalent is a bucketed Dataset of sorted successor arrays.
  * High-out-degree hubs are *salted*: a vertex with more than `chunkSize`
  * successors is split across several rows (`chunk` = 0,1,2,…) so no single
  * shuffle row or downstream task carries an unbounded array — the Spark
  * analogue of the reference's arc-balanced work splitting
  * (`/root/reference/src/algo/hyperball/hyperball_impl.rs:994-1018`).
  *
  * `deg` is always the FULL out-degree of `src` (repeated on every chunk),
  * so per-edge weights like PageRank's `rank/deg` never need a second join.
  */
case class AdjChunk(src: Long, deg: Long, chunk: Int, dsts: Array[Long])

/** A directed graph held as a Dataset of edges plus lazily-built,
  * persisted CSR-style adjacency (and its transpose — the reference
  * materializes transposes as first-class inputs rather than doing
  * reverse-edge lookups, `/root/reference/src/main.rs:46`).
  *
  * All operators in `graft.operators` consume this.
  */
final class Graph private (
    @transient val spark: SparkSession,
    /** Deduplicated directed edges. */
    val edges: Dataset[Edge],
    val chunkSize: Int
) extends Serializable {
  import spark.implicits._

  /** Vertices = every id appearing as src or dst. Persisted on demand. */
  lazy val vertices: Dataset[Long] = {
    val v = edges
      .select($"src".as("id"))
      .union(edges.select($"dst".as("id")))
      .distinct()
      .as[Long]
      .persist(StorageLevel.MEMORY_AND_DISK)
    v
  }

  lazy val numVertices: Long = vertices.count()
  lazy val numEdges: Long = edges.count()

  /** (id, outDeg) for every vertex — dangling vertices included with 0. */
  lazy val outDegrees: DataFrame = {
    val d = edges.groupBy($"src".as("id")).agg(count(lit(1)).as("deg"))
    vertices
      .toDF("id")
      .join(d, Seq("id"), "left")
      .select($"id", coalesce($"deg", lit(0L)).as("deg"))
  }

  lazy val inDegrees: DataFrame = {
    val d = edges.groupBy($"dst".as("id")).agg(count(lit(1)).as("deg"))
    vertices
      .toDF("id")
      .join(d, Seq("id"), "left")
      .select($"id", coalesce($"deg", lit(0L)).as("deg"))
  }

  /** Forward CSR adjacency, hash-partitioned by src and persisted so each
    * iterative superstep only shuffles the (small) vertex-state side.
    */
  lazy val adjacency: Dataset[AdjChunk] = Graph.buildAdjacency(edges, chunkSize)

  /** Transpose adjacency (successor lists of the reversed graph). */
  lazy val transposeAdjacency: Dataset[AdjChunk] =
    Graph.buildAdjacency(edges.select($"dst".as("src"), $"src".as("dst")).as[Edge], chunkSize)

  /** The reversed graph as a Graph (shares nothing; cheap wrapper). */
  def transpose: Graph =
    new Graph(spark, edges.select($"dst".as("src"), $"src".as("dst")).as[Edge], chunkSize)

  /** Undirected view: edges ∪ transpose, deduplicated, self-loops kept.
    * This is what CC / label propagation / undirected algorithms consume
    * (the reference's `symm_*` algorithms assume a symmetric graph,
    * `/root/reference/src/algo/sccs/symm_seq.rs:16`).
    */
  def symmetrize: Graph = {
    val sym = edges
      .union(edges.select($"dst".as("src"), $"src".as("dst")).as[Edge])
      .distinct()
    new Graph(spark, sym, chunkSize)
  }

  def unpersist(): Unit = {
    vertices.unpersist()
    adjacency.unpersist()
    transposeAdjacency.unpersist()
  }
}

object Graph {

  val DefaultChunkSize = 8192

  /** Build a graph from any DataFrame with (src, dst) columns castable to
    * Long. Edges are deduplicated (the reference's test graphs contain
    * duplicate arcs and self-loops on ingest; BV adjacency is a set).
    */
  def fromEdges(df: DataFrame, chunkSize: Int = DefaultChunkSize): Graph = {
    val spark = df.sparkSession
    import spark.implicits._
    val e = df
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .as[Edge]
    new Graph(spark, e, chunkSize)
  }

  def fromPairs(spark: SparkSession, pairs: Seq[(Long, Long)], chunkSize: Int = DefaultChunkSize): Graph = {
    import spark.implicits._
    fromEdges(pairs.toDF("src", "dst"), chunkSize)
  }

  /** Sorted-successor chunked adjacency.
    *
    * Scale notes: the chunk id is computed *before* aggregation with a
    * per-src window (`row_number` over (src, dst)), so the `collect_list`
    * buffer is bounded by `chunkSize` even for hubs — no unbounded
    * aggregation state. The result is hash-partitioned by src and persisted;
    * iterative operators join vertex state against it on src, so only the
    * state side shuffles per superstep (Spark reuses the cached exchange).
    */
  private[graft] def buildAdjacency(edges: Dataset[Edge], chunkSize: Int): Dataset[AdjChunk] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val perSrc = Window.partitionBy($"src").orderBy($"dst")
    val adj = edges
      .withColumn("rn", row_number().over(perSrc))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy($"src")))
      .withColumn("chunk", (($"rn" - 1) / chunkSize).cast("int"))
      .groupBy($"src", $"deg", $"chunk")
      .agg(sort_array(collect_list($"dst")).as("dsts"))
      .select($"src", $"deg", $"chunk", $"dsts")
      .as[AdjChunk]
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj
  }
}
