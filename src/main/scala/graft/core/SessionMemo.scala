package graft.core

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for state shared across driver-contract queries
  * (a loaded graph, its components, an LSH pair-graph clustering): an
  * engine keeps such state resident across queries; re-deriving it per
  * query double-pays every member of the family in a Verify/Bench run.
  * Keyed by session identity so a stopped session's cached plans are
  * never reused, and evicted when the owning session stops so dead
  * sessions' persisted frames don't pin memory for the JVM lifetime.
  */
object SessionMemo {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), AnyRef]()

  /** NOT computeIfAbsent: the mapping functions nest (essShared →
    * sccShared → graph), and nested computeIfAbsent on one CHM is
    * spec-forbidden — it throws "Recursive update" whenever the two keys
    * share a hash bin. get/putIfAbsent tolerates the nesting; queries run
    * sequentially, so the lost-update race is benign (worst case one
    * duplicate computation).
    */
  def apply[T <: AnyRef](spark: SparkSession, key: String)(f: => T): T = {
    val it = memo.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    val k = (spark, key)
    val existing = memo.get(k)
    if (existing != null) existing.asInstanceOf[T]
    else {
      val v = f
      val prior = memo.putIfAbsent(k, v)
      (if (prior != null) prior else v).asInstanceOf[T]
    }
  }
}
