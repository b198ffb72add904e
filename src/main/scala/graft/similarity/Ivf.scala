package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** IVF-flat approximate-nearest-neighbor search — the coarse-quantizer
  * scale path for embedding similarity, complementing the sign-LSH route
  * ([[VectorSim.lshTopK]]). Not in the reference (it has no ANN); this is
  * the standard inverted-file design (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", §IV-A) re-expressed Spark-first:
  *
  *  - the quantizer (nlist centroids) is TINY by construction and lives
  *    on the driver; per-row cell scoring is a literal-array expression —
  *    fully codegen'd, NO shuffle and NO join to assign n vectors;
  *  - each vector lands in exactly one cell (its inverted list); a query
  *    probes its `nprobe` nearest cells; candidate generation is a plain
  *    equi-join on cell id — expected candidate work O(n · nprobe · n/nlist),
  *    never O(n²), and the shuffle key is the cell id, so the join scales
  *    with executors like any other keyed join;
  *  - a (query, candidate) pair meets via exactly ONE cell (the
  *    candidate's assignment), so no dedup pass is needed — same contract
  *    as the multi-probe LSH join.
  *
  * Cosine scores are rounded to 6 dp BEFORE every argmax/rank (assignment,
  * probe order, final top-k) with id-ascending tie-breaks, so results are
  * deterministic and portable to the DuckDB oracle.
  */
object Ivf {

  /** A coarse-quantizer cell center. `cid` ordering is the tie-break order
    * everywhere, so any monotone relabeling preserves results.
    */
  final case class Centroid(cid: Int, vec: Array[Float])

  private def normOf(v: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Deterministic seed quantizer: the embeddings of the `nlist` smallest
    * vec_ids, cid in vec_id order. Data-dependent enough to split real
    * corpora, yet exactly reproducible by the SQL oracle (`ORDER BY
    * vec_id LIMIT nlist`) — the training-free baseline; [[kmeans]] refines
    * it when recall matters more than oracle portability.
    */
  def seedCentroids(emb: DataFrame, nlist: Int): Seq[Centroid] =
    emb.orderBy(col("vec_id").asc).limit(nlist)
      .select(col("embedding")).collect()
      .toIndexedSeq.zipWithIndex
      .map { case (r, i) => Centroid(i, r.getSeq[Float](0).toArray) }

  /** Per-row array of `struct(negSim, cid)` vs every centroid, ascending
    * sort = (sim desc, cid asc). One codegen'd expression per centroid:
    * the quantizer rides the plan as literals — the Spark analogue of
    * FAISS keeping the coarse quantizer in memory on every worker.
    */
  private def sortedCells(cents: Seq[Centroid]): Column = {
    val scores = cents.map { c =>
      val sim = round(
        VectorSim.dotCol(col("embedding"), typedlit(c.vec.toSeq))
          / greatest(col("nrm") * lit(normOf(c.vec)), lit(1e-12)), 6)
      struct((-sim).as("negSim"), lit(c.cid).as("cid"))
    }
    sort_array(array(scores: _*))
  }

  /** Hard cluster assignment under a given quantizer: (vec_id, cell, sim)
    * where cell is the rounded-cosine argmax centroid (ties → smallest
    * cid, like the search path) and sim the rounded cosine to it. One
    * pass, zero shuffle — the centroids ride the plan as literals.
    */
  def assign(emb: DataFrame, cents: Seq[Centroid]): DataFrame = {
    require(cents.nonEmpty, "assign needs at least one centroid")
    emb.select(col("vec_id"), col("embedding"),
        VectorSim.normCol(col("embedding")).as("nrm"))
      .select(col("vec_id"), element_at(sortedCells(cents), 1).as("best"))
      .select(col("vec_id"),
        col("best").getField("cid").as("cell"),
        (-col("best").getField("negSim")).as("sim"))
  }

  /** Coarse assignment plus the probe list in ONE pass: (vec_id, cell,
    * probeCells array of the `nprobe` nearest cids) — the shared front
    * half of [[ivfTopK]] and [[Pq.ivfPqTopK]], still zero-shuffle.
    */
  def assignWithProbes(emb: DataFrame, cents: Seq[Centroid], nprobe: Int): DataFrame = {
    require(cents.nonEmpty, "assignWithProbes needs at least one centroid")
    emb.select(col("vec_id"), col("embedding"),
        VectorSim.normCol(col("embedding")).as("nrm"))
      .withColumn("cells", sortedCells(cents))
      .select(col("vec_id"),
        element_at(col("cells"), 1).getField("cid").as("cell"),
        transform(slice(col("cells"), 1, nprobe), s => s.getField("cid")).as("probeCells"))
  }

  /** IVF-flat cosine top-k. Output (vec_id, nbr_id, sim, rank), rank 1..k.
    *
    * `nlist` should grow with the corpus (√n is the classical choice) so
    * the expected inverted list stays O(√n); `nprobe` trades recall for
    * candidate volume exactly like LSH's probe radius. Default centroids
    * are [[seedCentroids]]; pass [[kmeans]] output for trained cells.
    * The quantizer must fit the driver/plan (nlist · dims floats) — by
    * design it does: even nlist=10⁵ at dims=64 is 25 MB.
    */
  def ivfTopK(emb: DataFrame, k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
              centroids: Option[Seq[Centroid]] = None): DataFrame = {
    val cents = centroids.getOrElse(seedCentroids(emb, nlist))
    require(cents.nonEmpty, "IVF needs at least one centroid")
    val v = emb.select(col("vec_id"), col("embedding"),
        VectorSim.normCol(col("embedding")).as("nrm"))
      .withColumn("cells", sortedCells(cents))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Inverted list membership: the nearest cell. Probes: nearest nprobe.
    val assign = v.select(col("vec_id"), col("embedding"), col("nrm"),
      element_at(col("cells"), 1).getField("cid").as("cell"))
    val probes = v.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(transform(slice(col("cells"), 1, nprobe), s => s.getField("cid")))
        .as("cell"))
    val pairs = probes.as("q").join(assign.as("c"),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("nbr_id"),
        round(VectorSim.dotCol(col("q.embedding"), col("c.embedding"))
          / greatest(col("q.nrm") * col("c.nrm"), lit(1e-12)), 6).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("nbr_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Spherical Lloyd refinement of the quantizer: assign every vector to
    * its nearest cell (same rounded-cosine argmax as the search path),
    * recompute each cell center as the mean of its members' UNIT vectors,
    * renormalize. Distributed per-dimension mean via posexplode +
    * groupBy(cell, dim) — only nlist·dims aggregated rows ever reach the
    * driver. A cell that loses all members keeps its previous center
    * (FAISS behavior). Deterministic up to float-sum reassociation in the
    * mean (assignment itself is rounded + tie-broken, so label flips need
    * a 1e-6 coincidence).
    */
  def kmeans(emb: DataFrame, nlist: Int, iters: Int = 3,
             init: Option[Seq[Centroid]] = None): Seq[Centroid] = {
    var cents = init.getOrElse(seedCentroids(emb, nlist))
    val v = emb.select(col("vec_id"), col("embedding"),
        VectorSim.normCol(col("embedding")).as("nrm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 1 to iters) {
        val assigned = v.withColumn("cell",
          element_at(sortedCells(cents), 1).getField("cid"))
        val sums = assigned
          .select(col("cell"),
            posexplode(transform(col("embedding"),
              x => x.cast("double") / greatest(col("nrm"), lit(1e-12)))))
          .groupBy(col("cell"), col("pos"))
          .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
          .collect()
        val byCell = sums.groupBy(_.getInt(0))
        cents = cents.map { c =>
          byCell.get(c.cid) match {
            case None => c // empty cell: keep previous center
            case Some(rows) =>
              val dims = rows.map(_.getInt(1)).max + 1
              val mean = new Array[Double](dims)
              rows.foreach(r => mean(r.getInt(1)) = r.getDouble(2) / r.getLong(3))
              val nrm = math.sqrt(mean.map(x => x * x).sum)
              Centroid(c.cid, mean.map(x => (x / math.max(nrm, 1e-12)).toFloat))
          }
        }
      }
      cents
    } finally v.unpersist()
  }

  /** Mean within-cluster cosine distance (1 − cos to own centroid) — the
    * spherical-k-means objective, for specs to assert Lloyd improves it.
    */
  def objective(emb: DataFrame, cents: Seq[Centroid]): Double = {
    val v = emb.select(col("embedding"),
      VectorSim.normCol(col("embedding")).as("nrm"))
    val best = element_at(sortedCells(cents), 1).getField("negSim")
    v.select(avg(lit(1.0) + best)).head().getDouble(0)
  }
}
