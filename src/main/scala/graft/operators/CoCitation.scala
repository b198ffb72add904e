package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Co-citation similarity (Small 1973) and Adamic–Adar link prediction
  * (Adamic & Adar 2003) over an arbitrary directed edge table — the
  * link-structure "related pages" signals: two targets cited together by
  * many sources are topically close, and rare co-citers count for more
  * than prolific ones (each common source `w` contributes
  * `1/ln(outdeg(w))` to the pair's Adamic–Adar score).
  *
  * Works on any (src, dst) column types with a total order (dense Long
  * ids, urls, hosts) — none of the arithmetic touches vertex identity.
  *
  * Scale shape: edges are deduplicated, out-degrees come from ONE window
  * count over the src-partitioned shuffle (no degree join), sources
  * above `maxOutDeg` are dropped BEFORE pair generation — a source with
  * out-degree d contributes C(d,2) pairs while saying almost nothing
  * about any single pair (the standard hub discount in co-citation /
  * SALSA-style similarity), so the cap turns a quadratic hub blowup
  * into ≤ C(maxOutDeg,2) pairs per source and keeps total pair volume
  * linear in capped arcs. The pair self-join is keyed on src and both
  * sides read the same persisted src-partitioned dataset (no exchange
  * precedes the join); the (u,v) aggregate partial-combines map-side
  * before its single shuffle.
  */
object CoCitation {

  val DefaultMaxOutDeg = 64

  /** (u, v, common, aa) for every target pair co-cited by at least
    * `minSupport` capped sources, with u < v. `aa` is rounded to 6 dp so
    * the score (and any ordering built on it) is stable under last-ulp
    * ln()/summation-order differences across engines. Sources with
    * out-degree 1 cannot co-cite, so every contributing ln(deg) ≥ ln 2.
    */
  def run(edges: DataFrame, maxOutDeg: Int = DefaultMaxOutDeg,
          minSupport: Int = 2): DataFrame = {
    require(maxOutDeg >= 2, s"maxOutDeg must be >= 2, got $maxOutDeg")
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val capped = edges
      .select(col("src"), col("dst"))
      .distinct()
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
      .where(col("deg") <= maxOutDeg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    capped.select(col("src"), col("deg"), col("dst").as("u"))
      .join(capped.select(col("src"), col("dst").as("v")), Seq("src"))
      .where(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(
        count(lit(1)).as("common"),
        round(sum(lit(1.0) / log(col("deg").cast("double"))), 6).as("aa"))
      .where(col("common") >= minSupport)
  }

  /** Neighborhood Jaccard over the same co-cited pairs: for targets u, v
    * with capped in-neighbor (citing-source) sets N(u), N(v),
    * jac = |N(u)∩N(v)| / (|N(u)| + |N(v)| − |N(u)∩N(v)|) — the
    * set-overlap normalization of co-citation, penalizing promiscuously
    * cited targets the raw `common` count rewards. Membership counts only
    * CAPPED sources (consistent with the pair counting, same hub
    * rationale). The ratio is ONE IEEE division of exact integers —
    * bit-identical cross-engine, no rounding needed.
    *
    * Scale shape: [[run]]'s pair plan plus one map-side-combined
    * in-degree count over the capped edges and two equi-joins of the
    * (already minSupport-filtered, so shrunken) pair table against it.
    * Output (u, v, common, jaccard).
    */
  def jaccard(edges: DataFrame, maxOutDeg: Int = DefaultMaxOutDeg,
              minSupport: Int = 2): DataFrame = {
    require(maxOutDeg >= 2, s"maxOutDeg must be >= 2, got $maxOutDeg")
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val capped = edges
      .select(col("src"), col("dst"))
      .distinct()
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
      .where(col("deg") <= maxOutDeg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = capped.select(col("src"), col("dst").as("u"))
      .join(capped.select(col("src"), col("dst").as("v")), Seq("src"))
      .where(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"))
      .where(col("common") >= minSupport)
    val indeg = capped.groupBy(col("dst")).agg(count(lit(1)).as("d"))
    pairs
      .join(indeg.select(col("dst").as("u"), col("d").as("du")), Seq("u"))
      .join(indeg.select(col("dst").as("v"), col("d").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("common"),
        (col("common").cast("double") / (col("du") + col("dv") - col("common")))
          .as("jaccard"))
  }
}
