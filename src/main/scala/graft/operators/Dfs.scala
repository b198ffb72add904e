package graft.operators

import graft.core.Graph

import scala.collection.mutable

/** Driver-exact sequential depth-first visit — the reference's DFS visit
  * framework (`/root/reference/src/algo/visits/depth_first/seq.rs`,
  * events `depth_first/mod.rs:89-153`) re-expressed as an iterative
  * event-stream fold. DFS order is inherently sequential (SURVEY §2.2):
  * at scale the consumers are re-algorithmized ([[TopoSort]] peeling,
  * [[Scc.run]] FB-Trim), and THIS visit is the small-graph/driver path
  * that preserves the reference's exact event order — the same declared
  * role as [[Scc.tarjanLocal]].
  *
  * Events fire in the exact order of the recursive formulation: Init per
  * new root tree, Previsit on discovery, Revisit (with on-stack flag) on
  * back/forward/cross arcs, Postvisit when a node's successor
  * enumeration completes, Done when a root's tree completes. Successors
  * are iterated in ascending id order (the reference's graphs expose
  * sorted successor lists). The visitor returns false to break, like the
  * reference's `ControlFlow::Break`.
  */
object Dfs {

  sealed trait Event
  final case class Init(root: Long) extends Event
  final case class Previsit(node: Long, pred: Long, root: Long, depth: Int) extends Event
  final case class Revisit(node: Long, pred: Long, root: Long, depth: Int, onStack: Boolean) extends Event
  final case class Postvisit(node: Long, pred: Long, root: Long, depth: Int) extends Event
  final case class Done(root: Long) extends Event

  /** Visit every root in order; returns false iff the visitor broke. */
  def visit(edges: Seq[(Long, Long)], roots: Seq[Long], visitor: Event => Boolean): Boolean =
    visitWithPath(edges, roots, visitor)._1

  /** [[visit]] plus interrupted-visit path recovery — the reference's
    * `SeqPath`/`stack()` (`depth_first/seq.rs:24,170-183`): when the
    * visitor breaks, the second element is the residual visit path
    * (root → current node, in push order) that the break abandoned —
    * Tarjan uses it to flush the in-progress path after its whole-graph
    * early exit (`tarjan.rs:113-117`). Empty when the visit completed
    * (or broke between trees, where the path is empty by definition).
    */
  def visitWithPath(edges: Seq[(Long, Long)], roots: Seq[Long],
                    visitor: Event => Boolean): (Boolean, Seq[Long]) = {
    val adj = edges.distinct.groupBy(_._1).map { case (s, l) => s -> l.map(_._2).sorted }
    val known = mutable.Set[Long]()
    val onStack = mutable.Set[Long]()

    for (root <- roots if !known.contains(root)) {
      // stack frames: (node, pred, depth, successor iterator)
      val work = mutable.ArrayBuffer[(Long, Long, Int, Iterator[Long])]()
      def path: Seq[Long] = work.map(_._1).toSeq
      if (!visitor(Init(root))) return (false, path)
      def push(v: Long, pred: Long, depth: Int): Boolean = {
        known += v; onStack += v
        work += ((v, pred, depth, adj.getOrElse(v, Nil).iterator))
        visitor(Previsit(v, pred, root, depth))
      }
      if (!push(root, root, 0)) return (false, path)
      while (work.nonEmpty) {
        val (v, pred, depth, it) = work.last
        var descended = false
        while (!descended && it.hasNext) {
          val w = it.next()
          if (!known.contains(w)) {
            if (!push(w, v, depth + 1)) return (false, path)
            descended = true
          } else {
            if (!visitor(Revisit(w, v, root, depth + 1, onStack.contains(w)))) return (false, path)
          }
        }
        if (!descended) {
          work.remove(work.length - 1)
          onStack -= v
          if (!visitor(Postvisit(v, pred, root, depth))) return (false, path)
        }
      }
      if (!visitor(Done(root))) return (false, path)
    }
    (true, Nil)
  }

  private def verts(edges: Seq[(Long, Long)]): Seq[Long] =
    (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted

  /** Reverse DFS postorder over all vertices in ascending-root order —
    * the reference's `top_sort` (`top_sort.rs:17-46`): a topological
    * order on DAGs, exit-time order otherwise. EXACT order parity with
    * the reference's goldens (`test_depth_first.rs:18-36`).
    */
  def topSortLocal(edges: Seq[(Long, Long)]): Seq[Long] = {
    val out = mutable.ArrayBuffer[Long]()
    visit(edges, verts(edges), {
      case Postvisit(node, _, _, _) => out += node; true
      case _ => true
    })
    out.reverseIterator.toSeq
  }

  /** DFS acyclicity: break on the first on-stack revisit (a back arc) —
    * `acyclicity.rs:16-38`.
    */
  def isAcyclicLocal(edges: Seq[(Long, Long)]): Boolean =
    visit(edges, verts(edges), {
      case Revisit(_, _, _, _, true) => false
      case _ => true
    })

  /** Collected-graph variants, guarded like [[Scc.tarjanLocal]]. */
  def topSortLocal(graph: Graph, maxNodes: Long): Seq[Long] = {
    require(graph.numVertices <= maxNodes,
      s"Dfs is the driver-exact path (${graph.numVertices} > $maxNodes nodes); use TopoSort.run")
    topSortLocal(graph.edges.collect().map(e => (e.src, e.dst)).toSeq)
  }
}
