package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (array<float>). Dot products and norms are codegen'd
  * `zip_with`/`aggregate` expressions in double precision — no UDFs.
  */
object VectorSim {

  import org.apache.spark.sql.GraftSql.{column, expression}

  /** Σ aᵢ·bᵢ in double precision, left-to-right (deterministic) — a
    * native codegen'd expression ([[graft.functions.VectorExpressions]]);
    * the interpreted `aggregate(zip_with(...))` equivalent cost ~14 µs
    * per pair on the O(n²) baseline.
    */
  def dotCol(a: Column, b: Column): Column =
    column(graft.functions.VectorExpressions.DotExpr(expression(a), expression(b)))

  def normCol(a: Column): Column =
    column(graft.functions.VectorExpressions.NormExpr(expression(a)))

  /** Brute-force cosine top-k per vector (the exactness baseline).
    * Output (vec_id, nbr_id, sim, rank), rank 1..k; sim rounded to 6 dp
    * BEFORE ranking so ordering is stable across engines/float orders,
    * ties broken by nbr_id asc.
    *
    * O(n²) pairs by design — at scale use [[lshTopK]]; this one exists to
    * measure its recall and to serve small/filtered candidate sets.
    */
  def bruteForceTopK(emb: DataFrame, k: Int = 5): DataFrame = {
    val v = emb.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    v.count() // the all-pairs self-join scans v twice (the persist race)
    val pairs = v.as("q").join(v.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("nbr_id"),
        round(dotCol(col("q.embedding"), col("c.embedding"))
          / greatest(col("q.nrm") * col("c.nrm"), lit(1e-12)), 6).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("nbr_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic sign-LSH bucket id: bit b = sign of the sum of the
    * b-th block of `dims/bits` coordinates (a fixed, data-independent
    * family of hyperplanes — portable to the SQL oracle, unlike random
    * gaussian projections).
    */
  def bucketCol(emb: Column, dims: Int, bits: Int): Column = {
    val block = dims / bits
    (0 until bits).map { b =>
      val s = aggregate(
        transform(slice(emb, b * block + 1, block), x => x.cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, shiftleft(lit(1), b)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucket-count sizing for [[lshTopK]]: enough hyperplanes that the
    * EXPECTED bucket holds ~`targetBucket` vectors, so within-bucket
    * candidate generation stays O(n·targetBucket) as the corpus grows —
    * a fixed `bits` (2⁴ buckets) leaves bucket size O(n) and the
    * "bucketed" join quadratic at corpus scale. Capped at `dims/4` so
    * each hyperplane still sums ≥4 coordinates.
    */
  def autoBits(n: Long, dims: Int = 64, targetBucket: Long = 1024): Int = {
    val needed = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(n / math.max(targetBucket, 1), 1) - 1)
    math.min(math.max(needed, 4), dims / 4)
  }

  /** LSH-bucketed cosine top-k: candidates restricted to buckets within
    * Hamming distance `probe` of the query's bucket (multi-probe LSH —
    * the standard recall lever that lets `bits` stay high/selective).
    * Probing is an equi-join: the query side is exploded into its
    * `Σ_{h<=probe} C(bits,h)` probe buckets and joined on bucket id —
    * shuffle-safe at scale; each (query, candidate) pair matches via
    * exactly one probe, so no dedup pass is needed. `bits <= 0` ⇒ sized
    * by [[autoBits]] from the corpus count.
    *
    * Recall expectation, measured honestly: on ISOTROPIC (unclustered)
    * vectors, cosine neighbors are barely above random and ANY sub-linear
    * candidate set caps recall near its sampling fraction — on the
    * synthetic testdata embeddings (bits=4, probe=1) that is ~0.49
    * recall@5 at ~31% of the corpus scanned vs ~0.15 at probe 0. On data
    * with real near-duplicate structure (cosine ≥ 0.9 pairs — ANN
    * dedup's actual workload) sign-LSH agreement per plane is
    * 1 − θ/π ≈ 0.9+ and near-dup recall is high; the spec pins ≥ 0.9 on
    * a planted-duplicate corpus at bits=8, probe=1.
    */
  /** Bit-flip masks for multi-probe: the identity plus every mask at
    * Hamming weight <= probe (precomputed on the driver).
    */
  private def probeMasks(effBits: Int, probe: Int): Seq[Int] = {
    val one = (0 until effBits).map(1 << _)
    val two = for (i <- 0 until effBits; j <- i + 1 until effBits)
      yield (1 << i) | (1 << j)
    Seq(0) ++ (if (probe >= 1) one else Nil) ++ (if (probe >= 2) two else Nil)
  }

  def lshTopK(emb: DataFrame, k: Int = 5, dims: Int = 64, bits: Int = 0,
              probe: Int = 1): DataFrame = {
    require(probe >= 0 && probe <= 2, "probe radius 0..2 supported")
    val effBits = if (bits > 0) bits else autoBits(emb.count(), dims)
    val v = emb.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"),
      bucketCol(col("embedding"), dims, effBits).as("bucket"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    v.count() // the probe self-join scans v twice (the persist race)
    // Probe buckets: the query bucket plus every bucket at Hamming
    // distance <= probe (bit-flip masks precomputed on the driver).
    val masks: Seq[Int] = probeMasks(effBits, probe)
    val q = v.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val pairs = q.as("q").join(v.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("vec_id"), col("c.vec_id").as("nbr_id"),
        round(dotCol(col("q.embedding"), col("c.embedding"))
          / greatest(col("q.nrm") * col("c.nrm"), lit(1e-12)), 6).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("nbr_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate PAIRS: every unordered pair (a < b)
    * with `round(cosine, 6) >= threshold`, candidates generated by the
    * same multi-probe sign-LSH bucketing as [[lshTopK]] so candidate
    * generation stays an equi-join at corpus scale (never an n² compare).
    * Each qualifying pair inside the probe radius matches via EXACTLY one
    * probe mask (the mask is determined by the two bucket ids), so no
    * dedup pass is needed. Output (a, b, sim).
    *
    * Recall contract is the LSH one: pairs whose buckets differ by more
    * than `probe` bits are missed — at a near-dup threshold (cosine
    * >= 0.9) per-plane agreement is 1 − θ/π ≈ 0.9+, so high-sim pairs
    * concentrate within the probe radius; that is the standard
    * SimHash/sign-LSH dedup trade (cf. `d_simhash_pairs`, which makes
    * the same bargain pigeonhole-COMPLETE for Hamming distance instead).
    */

  def nearDupPairs(emb: DataFrame, threshold: Double, dims: Int = 64,
                   bits: Int = 0, probe: Int = 1): DataFrame = {
    require(probe >= 0 && probe <= 2, "probe radius 0..2 supported")
    val effBits = if (bits > 0) bits else autoBits(emb.count(), dims)
    val v = emb.select(col("vec_id"), col("embedding"),
      normCol(col("embedding")).as("nrm"),
      bucketCol(col("embedding"), dims, effBits).as("bucket"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    v.count() // the probe self-join scans v twice (the persist race)
    val q = v.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(array(probeMasks(effBits, probe)
        .map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    q.as("q").join(v.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") < col("c.vec_id"))
      .select(col("q.vec_id").as("a"), col("c.vec_id").as("b"),
        round(dotCol(col("q.embedding"), col("c.embedding"))
          / greatest(col("q.nrm") * col("c.nrm"), lit(1e-12)), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Int8 scalar-quantized (SQ) vectors: per-vector symmetric max-abs
    * scale s = 127 / max|xᵢ|, qᵢ = floor(xᵢ·s + 0.5) ∈ [−127, 127] —
    * floor-based rounding, NOT `round()`, because floor(x + 0.5) is one
    * IEEE add + one floor that every engine computes bit-identically,
    * while round()'s half-even vs half-away tie rule differs across
    * engines. The scale CANCELS in cosine (q ∝ x per vector), so
    * quantized cosine = intdot(qa, qb) / (√intdot(qa,qa)·√intdot(qb,qb))
    * needs no per-vector scale at query time, and every intermediate is
    * an exact small integer in double (dims·127² ≪ 2⁵³) — the quantized
    * similarity is bit-identical cross-engine before the final division.
    *
    * Output schema: (vec_id, q: array<double> of integer values, qn).
    */
  def quantize(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), col("embedding"),
        aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
          lit(0.0), (m, y) => greatest(m, y)).as("amax"))
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          floor(x.cast("double") * (lit(127.0) / greatest(col("amax"), lit(1e-12)))
            + lit(0.5)).cast("double")).as("q"))
      .select(col("vec_id"), col("q"), sqrt(dotCol(col("q"), col("q"))).as("qn"))

  /** SQ-scored ANN top-k: candidates from the SAME multi-probe sign-LSH
    * bucketing as [[lshTopK]] (computed on the float vectors), scores
    * from the int8-quantized vectors — the production ANN shape, where
    * the index holds 4×-compressed vectors (64 int8 bytes vs 256 float
    * bytes per 64-dim vector; at 10¹⁰ embeddings that is 640 GB vs
    * 2.5 TB of vector payload in the candidate join) and full-precision
    * re-rank is an optional second pass. Quantization error on cosine is
    * O(1/127) per coordinate pair — the spec measures top-k agreement
    * against exact scoring of the same candidates.
    */
  def sqTopK(emb: DataFrame, k: Int = 5, dims: Int = 64, bits: Int = 0,
             probe: Int = 1): DataFrame = {
    require(probe >= 0 && probe <= 2, "probe radius 0..2 supported")
    val effBits = if (bits > 0) bits else autoBits(emb.count(), dims)
    // Quantization + bucketing in ONE scan over the embeddings (same
    // per-row expressions as [[quantize]] — a join back would shuffle
    // the whole vector payload for columns computable in place).
    val v = emb
      .select(col("vec_id"), col("embedding"),
        bucketCol(col("embedding"), dims, effBits).as("bucket"),
        aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
          lit(0.0), (m, y) => greatest(m, y)).as("amax"))
      .select(col("vec_id"), col("bucket"),
        transform(col("embedding"), x =>
          floor(x.cast("double") * (lit(127.0) / greatest(col("amax"), lit(1e-12)))
            + lit(0.5)).cast("double")).as("q"))
      .select(col("vec_id"), col("bucket"), col("q"),
        sqrt(dotCol(col("q"), col("q"))).as("qn"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    v.count() // the probe self-join scans v twice (the persist race)
    val q = v.select(col("vec_id"), col("q"), col("qn"),
      explode(array(probeMasks(effBits, probe)
        .map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val pairs = q.as("a").join(v.as("c"),
        col("a.bucket") === col("c.bucket") && col("a.vec_id") =!= col("c.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("c.vec_id").as("nbr_id"),
        round(dotCol(col("a.q"), col("c.q"))
          / greatest(col("a.qn") * col("c.qn"), lit(1e-12)), 6).as("sim"))
    val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("nbr_id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
