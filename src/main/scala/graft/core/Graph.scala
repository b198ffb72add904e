package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
    val chunkSize: Int,
    /** True when `edges` is already hash-clustered by src (a
      * [[Bucketed]] table scan): the forward-adjacency build then skips
      * its repartition. Applies to the FORWARD direction only — the
      * transpose still needs its own shuffle.
      */
    private val edgesClustered: Boolean = false
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
  lazy val adjacency: Dataset[AdjChunk] =
    Graph.buildAdjacency(edges, chunkSize, clustered = edgesClustered)

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

  /** Graph over a [[Bucketed.writeEdges]] table. The write already
    * deduplicated and src-clustered the arcs, so the adjacency assembly
    * SKIPS the repartition a raw edge file needs — only an in-partition
    * sort remains (a bucket's files are each sorted, but the scan
    * concatenates them, so the cheap local re-sort is still required;
    * no exchange anywhere). Iterative superstep joins against the
    * persisted adjacency — and any direct `state ⋈ edges` / degree
    * aggregation — likewise reuse the bucket partitioning.
    */
  def fromBucketed(spark: SparkSession, table: String, chunkSize: Int = DefaultChunkSize): Graph = {
    import spark.implicits._
    val e = Bucketed.edges(spark, table).as[Edge]
    new Graph(spark, e, chunkSize, edgesClustered = true)
  }

  /** Sorted-successor chunked adjacency: ONE shuffle (hash by src) + an
    * in-partition sort + a streaming pass assembling CSR chunk rows.
    *
    * Deliberately NOT `groupBy(src).agg(collect_list(dst))`: that plans an
    * ObjectHashAggregate whose per-group object buffers fall back to
    * sort-based aggregation at a tiny key threshold — measured ~10×
    * slower on web-scale adjacency, and it re-runs on any cache
    * re-materialization. The mapPartitions pass instead walks the sorted
    * run once: dedups consecutive duplicate arcs, buffers exactly one
    * vertex's successor list at a time (bounded by max out-degree — the
    * same assumption the reference's BV successor decoding makes), and
    * splits hubs into `chunkSize` chunks (salting). Output retains the
    * src hash-partitioning and is persisted; iterative operators join
    * vertex state against it on src, so only the state side shuffles per
    * superstep.
    */
  private[graft] def buildAdjacency(edges: Dataset[Edge], chunkSize: Int,
                                    clustered: Boolean = false): Dataset[AdjChunk] = {
    val spark = edges.sparkSession
    import spark.implicits._
    // A bucketed scan is already src-clustered: skip the exchange, keep
    // the (cheap, local) sort — bucket files are each sorted but the scan
    // concatenates a bucket's files, so per-partition order must be
    // re-established.
    val part = if (clustered) edges else edges.repartition(col("src"))
    val adj = part
      .sortWithinPartitions($"src", $"dst")
      .mapPartitions { it =>
        new Iterator[AdjChunk] {
          private val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
          private var pendingSrc = 0L
          private var pending: List[AdjChunk] = Nil
          private var lookahead: Option[Edge] = None

          private def flush(): Unit = {
            val deg = buf.length
            pending = buf.grouped(chunkSize).zipWithIndex.map { case (c, i) =>
              AdjChunk(pendingSrc, deg.toLong, i, c.toArray)
            }.toList
            buf.clear()
          }

          private def fill(): Unit = {
            while (pending.isEmpty && (lookahead.nonEmpty || it.hasNext)) {
              val e = lookahead.getOrElse(it.next())
              lookahead = None
              if (buf.isEmpty) { pendingSrc = e.src; buf += e.dst }
              else if (e.src == pendingSrc) {
                if (buf.last != e.dst) buf += e.dst // sorted → dedup adjacent
              } else { lookahead = Some(e); flush() }
            }
            if (pending.isEmpty && buf.nonEmpty) flush()
          }

          def hasNext: Boolean = { fill(); pending.nonEmpty }
          def next(): AdjChunk = { fill(); val h = pending.head; pending = pending.tail; h }
        }
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj
  }
}
