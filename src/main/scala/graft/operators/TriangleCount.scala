package graft.operators

import graft.core.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting by degree-ordered edge orientation + wedge closing
  * (the "node-iterator++" / compact-forward algorithm).
  *
  * The graph is first made simple and undirected (direction and self-loops
  * ignored — the standard definition over web link graphs). Each undirected
  * edge {u,v} is oriented u→v iff (deg(u), u) < (deg(v), v); every triangle
  * then has exactly ONE vertex with two outgoing oriented edges, so
  *   triangles = |{ (a,b),(a,c) ∈ E⃗, b<c : (b,c) ∈ E⃗ }|
  * counts each triangle exactly once.
  *
  * Scale: orientation bounds oriented out-degree by O(√m) even for hubs
  * (a vertex only keeps neighbors of larger degree), which bounds the
  * wedge blow-up of the self-join — this is the skew story, replacing the
  * reference's shared-memory adjacency intersection with a shuffle-safe
  * equivalent. The wedge→edge join is a plain shuffle hash join on
  * (b, c); partial aggregation does the counting.
  */
object TriangleCount {

  /** Oriented simple edges (src, dst) with (deg,id)-order src < dst. */
  def orient(graph: Graph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val und = graph.edges
      .filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
    orientCanonical(und)
  }

  /** Orientation of canonical undirected simple edges (u<v by id). */
  private def orientCanonical(und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    val uFirst = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"))
  }

  /** All triangles as (a, b, c) vertex triples: a = the (deg,id)-minimal
    * apex (the one vertex whose two triangle edges are both outgoing in
    * the orientation), b < c by id. Each triangle appears exactly once.
    *
    * The closing edge {b,c} is checked against the CANONICAL undirected
    * edge set (u<v by id) rather than the oriented set — b,c are not
    * (deg,id)-ordered, so the oriented edge between them may point either
    * way; the canonical form keeps the join an equi-join (no OR
    * condition → stays a shuffle hash join, never a nested loop).
    */
  def triangles(graph: Graph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val und = graph.edges
      .filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val o = orientCanonical(und).persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = o.select(col("src").as("a"), col("dst").as("b"))
    val e2 = o.select(col("src").as("a"), col("dst").as("c"))
    val wedges = e1.join(e2, Seq("a")).filter(col("b") < col("c"))
    wedges
      .join(und, wedges("b") === und("u") && wedges("c") === und("v"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }

  def total(graph: Graph): Long = triangles(graph).count()

  /** Per-edge triangle support — the number of triangles containing each
    * canonical undirected edge (u < v), 0 for triangle-free edges. This
    * is the k-truss peeling signal: k-truss = iterate (filter support <
    * k−2, recount), and one support pass is the whole per-round cost.
    * Same plan family as [[triangles]] (wedge equi-join + semi-join),
    * plus ONE map-side-combined count shuffle keyed by the edge — each
    * triangle (a, b, c) credits its three edges, so the shuffle carries
    * 3·T rows partial-aggregated, never the wedge stream.
    */
  def edgeSupport(
      graph: Graph,
      /** Opt-in bounded driver-local exact path (the
        * [[ConnectedComponents.run]] / [[SumSweep.compute]] cap pattern):
        * when > 0 and the arc count fits the budget (~16 B/arc
        * collected), supports come from one driver bitset/merge
        * intersection pass ([[localSupports]]) instead of the wedge
        * equi-join — whose Σ deg² wedge stream is the whole cost on the
        * dense derived gate faces. Identical counts by definition;
        * default 0 = always distributed (every pre-existing caller and
        * spec unchanged).
        */
      localFinishEdges: Long = 0L): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    if (localFinishEdges > 0 && graph.numEdges <= localFinishEdges) {
      val canon = collectCanonical(graph)
      val sup = localSupports(canon)
      return spark.createDataFrame(
        spark.sparkContext.parallelize(
          canon.indices.map(i => (canon(i)._1, canon(i)._2, sup(i))),
          math.max(1, spark.sparkContext.defaultParallelism / 4)))
        .toDF("u", "v", "support")
    }
    val und = graph.edges
      .filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    supportOfCanonical(und)
  }

  /** Canonical (u < v, loop-free, distinct) undirected edges collected to
    * the driver — the local-exact twin's input. ~16 B/edge, same budget
    * arithmetic as [[ConnectedComponents.run]]'s `localFinishEdges`.
    */
  private[operators] def collectCanonical(graph: Graph): Array[(Long, Long)] = {
    val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    graph.edges.collect().foreach { e =>
      if (e.src != e.dst) {
        val p = (math.min(e.src, e.dst), math.max(e.src, e.dst))
        if (seen.add(p)) buf += p
      }
    }
    buf.toArray
  }

  /** Driver-local exact per-edge triangle supports over canonical edges —
    * the cap-guarded twin of [[supportOfCanonical]]'s wedge-join plan
    * (identical counts by definition: support(u,v) = |N(u) ∩ N(v)| over
    * the undirected simple graph). Dense small graphs (the derived gate
    * faces are near-cliques) use N-bit adjacency bitsets —
    * popcount(row(u) & row(v)) per edge — which replaces the wedge
    * blow-up (Σ deg² rows through a shuffle) with n²/64-word AND streams;
    * larger sparse graphs under the cap use sorted-adjacency merge
    * intersection (Σ_e deg(u)+deg(v) word reads).
    */
  private[operators] def localSupports(canon: Array[(Long, Long)]): Array[Long] = {
    // compact ids
    val idToIdx = new java.util.HashMap[Long, Integer]()
    var n = 0
    canon.foreach { case (u, v) =>
      if (!idToIdx.containsKey(u)) { idToIdx.put(u, n); n += 1 }
      if (!idToIdx.containsKey(v)) { idToIdx.put(v, n); n += 1 }
    }
    val us = new Array[Int](canon.length)
    val vs = new Array[Int](canon.length)
    var i = 0
    while (i < canon.length) {
      us(i) = idToIdx.get(canon(i)._1); vs(i) = idToIdx.get(canon(i)._2); i += 1
    }
    val sup = new Array[Long](canon.length)
    if (n.toLong * ((n + 63) / 64) <= (1L << 23)) { // bitset rows ≤ 64 MB total
      val words = (n + 63) >>> 6
      val adj = new Array[Long](n * words)
      i = 0
      while (i < canon.length) {
        val u = us(i); val v = vs(i)
        adj(u * words + (v >>> 6)) |= 1L << (v & 63)
        adj(v * words + (u >>> 6)) |= 1L << (u & 63)
        i += 1
      }
      i = 0
      while (i < canon.length) {
        val ou = us(i) * words; val ov = vs(i) * words
        var s = 0L; var w = 0
        while (w < words) { s += java.lang.Long.bitCount(adj(ou + w) & adj(ov + w)); w += 1 }
        sup(i) = s
        i += 1
      }
    } else {
      // sorted neighbor arrays + two-pointer intersection
      val deg = new Array[Int](n)
      i = 0; while (i < canon.length) { deg(us(i)) += 1; deg(vs(i)) += 1; i += 1 }
      val off = new Array[Int](n + 1)
      i = 0; while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
      val nbr = new Array[Int](2 * canon.length)
      val fill = java.util.Arrays.copyOf(off, n)
      i = 0
      while (i < canon.length) {
        val u = us(i); val v = vs(i)
        nbr(fill(u)) = v; fill(u) += 1
        nbr(fill(v)) = u; fill(v) += 1
        i += 1
      }
      i = 0
      while (i < n) { java.util.Arrays.sort(nbr, off(i), off(i + 1)); i += 1 }
      i = 0
      while (i < canon.length) {
        val u = us(i); val v = vs(i)
        var a = off(u); val ae = off(u + 1)
        var b = off(v); val be = off(v + 1)
        var s = 0L
        while (a < ae && b < be) {
          val x = nbr(a); val y = nbr(b)
          if (x == y) { s += 1; a += 1; b += 1 }
          else if (x < y) a += 1
          else b += 1
        }
        sup(i) = s
        i += 1
      }
    }
    sup
  }

  /** [[edgeSupport]] over an ALREADY-CANONICAL (u < v, simple, loop-free)
    * undirected edge table — the per-round primitive of the [[KTruss]]
    * peel, which hands in its (materialized, checkpoint-cut) surviving
    * edge state each round. `und` is referenced three times (orientation,
    * closing-edge semi-join, zero-support left join): callers must pass a
    * persisted/materialized frame or pay the scan thrice.
    */
  def supportOfCanonical(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    val o = orientCanonical(und)
    val e1 = o.select(col("src").as("a"), col("dst").as("b"))
    val e2 = o.select(col("src").as("a"), col("dst").as("c"))
    val wedges = e1.join(e2, Seq("a")).filter(col("b") < col("c"))
    val tri = wedges
      .join(und, wedges("b") === und("u") && wedges("c") === und("v"), "left_semi")
    // a is the (deg,id)-minimal apex, not id-minimal — canonicalize the
    // two apex edges; (b, c) is already canonical (b < c by construction).
    // explode, NOT a 3-way union of selects over `tri`: union branches are
    // independent subtrees, so the wedge join + closing semi-join would be
    // recomputed three times (measured: the dominant stage of the dense
    // gate graph's support pass ran 3x, ~16 s each at sf0.1).
    val sup = tri.select(explode(array(
        struct(least($"a", $"b").as("u"), greatest($"a", $"b").as("v")),
        struct(least($"a", $"c").as("u"), greatest($"a", $"c").as("v")),
        struct($"b".as("u"), $"c".as("v")))).as("e"))
      .select($"e.u".as("u"), $"e.v".as("v"))
      .groupBy($"u", $"v").agg(count(lit(1)).as("support"))
    und.join(sup, Seq("u", "v"), "left")
      .select($"u", $"v", coalesce($"support", lit(0L)).as("support"))
  }

  /** DOULION sampled triangle estimate (Tsourakakis et al., KDD 2009):
    * keep each canonical undirected edge with probability p = 1/invP,
    * count triangles EXACTLY on the sampled subgraph, scale by invP³ —
    * an unbiased estimator whose variance vanishes on large graphs. At
    * 100 TB this is the knob that shrinks the wedge self-join (the whole
    * cost of exact counting) by p²: sampling runs map-side in the scan,
    * everything downstream sees a p-fraction graph.
    *
    * Sampling is a deterministic portable hash of the canonical edge
    * (md5-prefix — the same family the dedup operators use), NOT an RNG:
    * retries, partitioning, and the DuckDB oracle all see the identical
    * sample, so the gate compares exact numbers.
    *
    * Returns one row: (kept_edges, tri_sample, tri_est = tri_sample·invP³).
    */
  def doulion(graph: Graph, invP: Int = 4, salt: String = "doulion"): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    require(invP >= 1, s"invP must be >= 1, got $invP")
    val kept = graph.edges
      .filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .filter(
        graft.text.TextOps.portableHash60(
          concat($"u".cast("string"), lit(":"), $"v".cast("string"), lit(s":$salt"))) % invP === 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val o = orientCanonical(kept)
    val e1 = o.select(col("src").as("a"), col("dst").as("b"))
    val e2 = o.select(col("src").as("a"), col("dst").as("c"))
    val wedges = e1.join(e2, Seq("a")).filter(col("b") < col("c"))
    val tri = wedges
      .join(kept, wedges("b") === kept("u") && wedges("c") === kept("v"), "left_semi")
    val scale = invP.toLong * invP * invP
    tri.agg(count(lit(1)).as("tri_sample"))
      .crossJoin(kept.agg(count(lit(1)).as("kept_edges")))
      .select($"kept_edges", $"tri_sample", ($"tri_sample" * lit(scale)).as("tri_est"))
  }

  /** (id, triangles) for every vertex (0 for triangle-free vertices). */
  def perVertex(graph: Graph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    // explode, not union-of-selects: three union branches would recompute
    // the whole triangle pipeline (wedge join + semi-join) once each —
    // see [[supportOfCanonical]].
    val tri = triangles(graph)
    val counts = tri.select(explode(array($"a", $"b", $"c")).as("id"))
      .groupBy($"id").agg(count(lit(1)).as("triangles"))
    graph.vertices.toDF("id")
      .join(counts, Seq("id"), "left")
      .select($"id", coalesce($"triangles", lit(0L)).as("triangles"))
  }
}
