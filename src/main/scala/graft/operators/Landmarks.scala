package graft.operators

import graft.core.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Landmark distance sketches — the standard scalable answer to
  * "how far apart are these two pages?" on a graph where any exact
  * all-pairs structure is impossible (10¹² vertices): precompute each
  * vertex's distance to k high-centrality landmarks, then answer a pair
  * query with the triangle-inequality upper bound
  * min_l d(u,l) + d(l,v) (Potamias et al., CIKM 2009 — landmark
  * selection by degree is their strongest cheap heuristic on web/social
  * graphs).
  *
  * Scale shape: the sketch is ONE source-tagged multi-root BFS
  * ([[Bfs.tagged]] — k visits share every superstep's shuffle), state k
  * rows per vertex (k ≈ 16–64 in practice); a pair query is two
  * equi-joins of the query table against the sketch on (vertex) +
  * a per-pair min — never a graph traversal at query time.
  */
object Landmarks {

  /** Top-k landmarks by total (in+out) degree, ties to the smaller id —
    * deterministic and cheap (two map-side-combined degree aggregates +
    * a TakeOrdered k).
    */
  def pick(graph: Graph, k: Int): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    graph.outDegrees.withColumnRenamed("deg", "od")
      .join(graph.inDegrees.withColumnRenamed("deg", "indeg"), Seq("id"), "left")
      .select($"id", ($"od" + coalesce($"indeg", lit(0L))).as("tdeg"))
      .orderBy($"tdeg".desc, $"id".asc)
      .limit(k)
      .select($"id")
  }

  /** (landmark, id, dist) over the SYMMETRIZED graph (undirected
    * distances — the convention of the landmark-estimation literature;
    * pass a directed graph's `symmetrize`). Vertices unreachable from a
    * landmark are absent under its tag.
    */
  def sketch(sym: Graph, landmarks: DataFrame): DataFrame = {
    val spark = sym.spark
    import spark.implicits._
    val sources = landmarks.select($"id".as("tag"), $"id")
    Bfs.tagged(sym.adjacency, sources)
      .select($"tag".as("landmark"), $"id", $"dist".cast("long").as("dist"))
  }

  /** Upper-bound distance estimates for query `pairs` (u, v): one row
    * (u, v, est) per pair with at least one shared-component landmark;
    * est = min over landmarks of d(u,l) + d(l,v). Exact when some
    * landmark lies on a shortest u–v path; always ≥ the true distance.
    */
  def estimate(sketch: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    pairs.select($"u", $"v")
      .join(sketch.select($"landmark", $"id".as("u"), $"dist".as("du")), Seq("u"))
      .join(sketch.select($"landmark", $"id".as("v"), $"dist".as("dv")),
        Seq("landmark", "v"))
      .groupBy($"u", $"v")
      .agg(min($"du" + $"dv").as("est"))
  }
}
