package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the
  * compression half of the FAISS IVF-PQ design, next to the coarse
  * quantizer [[Ivf]] already in the engine:
  *
  *  - each UNIT vector is cut into `m` subvectors; each subvector is
  *    replaced by the id of its nearest codebook entry (`ksub` entries
  *    per subspace) — 64 floats (256 B) become m=4 codes (4 B), a 64×
  *    memory/shuffle compression for the candidate set;
  *  - similarity is computed ASYMMETRIC-free on codes via a precomputed
  *    m·ksub² look-up table of sub-centroid dot products (ADC): per pair
  *    cost is m table probes instead of d multiplies, and the LUT rides
  *    the plan as literals — fully codegen'd, no join to score;
  *  - candidates come from the [[Ivf]] coarse cells (equi-join on cell),
  *    so the pair volume is the inverted-list volume, never O(n²).
  *
  * Codebooks here are the DETERMINISTIC seed quantizer (subvectors of
  * the `ksub` smallest vec_ids' unit vectors, float-truncated) — the
  * training-free baseline the DuckDB oracle replays exactly, mirroring
  * [[Ivf.seedCentroids]]; [[Ivf.kmeans]]'s Lloyd loop is the trained
  * path when recall matters more than oracle portability. All argmaxes
  * round scores to 6 dp with id-ascending tie-breaks (the repo-wide
  * determinism contract).
  */
object Pq {

  /** cents(j)(code) = the float sub-centroid of subspace j. */
  final case class Codebooks(m: Int, ksub: Int, dsub: Int,
                             cents: IndexedSeq[IndexedSeq[Array[Float]]]) {
    /** ‖cents(j)(code)‖², double, summed in dimension order. */
    def csq(j: Int, code: Int): Double = {
      val c = cents(j)(code)
      var s = 0.0; var i = 0
      while (i < c.length) { val x = c(i).toDouble; s += x * x; i += 1 }
      s
    }
    /** ADC entry: dot of two sub-centroids of subspace j, double. */
    def lut(j: Int, a: Int, b: Int): Double = {
      val ca = cents(j)(a); val cb = cents(j)(b)
      var s = 0.0; var i = 0
      while (i < ca.length) { s += ca(i).toDouble * cb(i).toDouble; i += 1 }
      s
    }
  }

  /** Deterministic seed codebooks: unit vectors of the `ksub` smallest
    * vec_ids, sliced into `m` subvectors, float-truncated (the same
    * truncate-for-stability trick as the k-means oracle face).
    */
  def seedCodebooks(emb: DataFrame, m: Int = 4, ksub: Int = 8): Codebooks = {
    val rows = emb.orderBy(col("vec_id").asc).limit(ksub)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    require(rows.nonEmpty, "PQ needs at least one seed vector")
    val dims = rows.head.length
    require(dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    val dsub = dims / m
    val unit = rows.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }
      val n = math.max(math.sqrt(s), 1e-12)
      v.map(x => (x / n).toFloat)
    }
    Codebooks(m, ksub, dsub,
      (0 until m).map(j =>
        unit.toIndexedSeq.map(u => u.slice(j * dsub, (j + 1) * dsub))))
  }

  /** Unit vector as array<double> (division by the rounded-down norm is
    * guarded exactly like every cosine in the engine).
    */
  private def unitCol: Column =
    transform(col("embedding"),
      x => x.cast("double") / greatest(col("nrm"), lit(1e-12)))

  /** Per-subspace nearest code: argmax of round(dot − 0.5·‖c‖², 6)
    * (the −‖x‖²/2 term is constant per subvector and drops out), ties →
    * smaller code. One codegen'd literal expression per codebook entry.
    */
  private def codeCol(cb: Codebooks, j: Int): Column = {
    val sub = slice(col("un"), j * cb.dsub + 1, cb.dsub)
    val scored = (0 until cb.ksub).map { c =>
      val score = round(
        VectorSim.dotCol(sub, typedlit(cb.cents(j)(c).map(_.toDouble).toSeq))
          - lit(0.5) * lit(cb.csq(j, c)), 6)
      struct((-score).as("negScore"), lit(c).as("code"))
    }
    element_at(sort_array(array(scored: _*)), 1).getField("code")
  }

  /** PQ-encode: (vec_id, codes array<int>, rq = ‖reconstruction‖).
    * Codes and the reconstruction norm are pure literal expressions over
    * the scan — no shuffle, no join; the codebooks ride the plan exactly
    * like the IVF quantizer.
    */
  def encode(emb: DataFrame, cb: Codebooks): DataFrame = {
    val withUnit = emb
      .select(col("vec_id"), col("embedding"),
        VectorSim.normCol(col("embedding")).as("nrm"))
      .withColumn("un", unitCol)
    val coded = withUnit.select(col("vec_id"),
      array((0 until cb.m).map(j => codeCol(cb, j)): _*).as("codes"))
    val rqsq = (0 until cb.m).map { j =>
      element_at(typedlit((0 until cb.ksub).map(c => cb.csq(j, c))),
        element_at(col("codes"), j + 1) + 1)
    }.reduce(_ + _)
    coded.select(col("vec_id"), col("codes"), sqrt(rqsq).as("rq"))
  }

  /** ADC similarity of two code columns: Σ_j lut_j(codeA_j, codeB_j)
    * normalized by the reconstruction norms, rounded to 6 dp.
    */
  private def adcSim(cb: Codebooks, codesA: Column, rqA: Column,
                     codesB: Column, rqB: Column): Column = {
    val dot = (0 until cb.m).map { j =>
      val flat = (0 until cb.ksub).flatMap(a =>
        (0 until cb.ksub).map(b => cb.lut(j, a, b)))
      element_at(typedlit(flat),
        element_at(codesA, j + 1) * cb.ksub + element_at(codesB, j + 1) + 1)
    }.reduce(_ + _)
    round(dot / greatest(rqA * rqB, lit(1e-12)), 6)
  }

  /** IVF-PQ top-k: coarse candidates from the [[Ivf]] seed cells
    * (equi-join on cell id, multi-probe), scored by ADC over the PQ
    * codes. Output (vec_id, nbr_id, sim, rank), rank 1..k.
    *
    * Scale story: the shuffle carries (vec_id, cell, m codes, rq) ≈
    * 30 B/row instead of the 256 B embedding — the candidate join and
    * the scoring never touch the original vectors.
    */
  def ivfPqTopK(emb: DataFrame, k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
                m: Int = 4, ksub: Int = 8): DataFrame = {
    val cb = seedCodebooks(emb, m, ksub)
    val coarse = Ivf.seedCentroids(emb, nlist)
    val enc = encode(emb, cb)
    val v = Ivf.assignWithProbes(emb, coarse, nprobe)
      .join(enc, Seq("vec_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Salt the cell key and PIN the partition count: the join input is a
    // few KB (codes, not vectors), so AQE's coalescing folds a plain
    // cell-keyed join into ONE task — but the join OUTPUT explodes by
    // ~|cell| with an ADC evaluation per row, so that one task serializes
    // the whole scoring pass (measured 8.4 s single-task stage at sf0.1).
    // Sub-bucketing by a deterministic hash of the candidate id spreads
    // each cell across `subBuckets` keys, and repartition(n, keys) is
    // user-specified so AQE leaves its parallelism alone (guide §2.5:
    // skew from too few distinct synthetic keys). The pair multiset is
    // unchanged: each probe row meets each candidate exactly once (its
    // sub-bucket).
    val subBuckets = 8
    val parts = emb.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val assign = v.select(col("vec_id"), col("cell"), col("codes"), col("rq"),
        pmod(xxhash64(col("vec_id")), lit(subBuckets)).as("sb"))
      .repartition(parts, col("cell"), col("sb"))
    val probes = v.select(col("vec_id"), explode(col("probeCells")).as("cell"),
        col("codes"), col("rq"))
      .select(col("vec_id"), col("cell"), col("codes"), col("rq"),
        explode(lit((0 until subBuckets).map(_.toLong).toArray)).as("sb"))
      .repartition(parts, col("cell"), col("sb"))
    val pairs = probes.as("q").join(assign.as("c"),
        col("q.cell") === col("c.cell") && col("q.sb") === col("c.sb")
          && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("nbr_id"),
        adcSim(cb, col("q.codes"), col("q.rq"), col("c.codes"), col("c.rq")).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("nbr_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
