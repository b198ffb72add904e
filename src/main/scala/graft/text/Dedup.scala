package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. Pair-producing operators are banded /
  * bucketed so candidate generation is an equi-join (shuffle-safe at
  * 100 TB); only candidates are verified exactly.
  */
object Dedup {

  /** Resolve a feature-hash pair for the `hashMode` option shared by
    * [[minHashSignatures]] / [[simHash]] (same contract as
    * [[TextOps.winnow]]'s hashMode):
    *
    *  - `"md5"` (default): the portable 60-bit md5-prefix family — the
    *    DuckDB oracle replays it bit-identically, keeping the `d_*` gate
    *    rows hash-verified;
    *  - `"xxhash64"`: Spark's codegen'd xxhash64 masked into the SAME
    *    nonneg 60-bit range (and the same 53-bit shift for the second
    *    base), so every overflow-safety invariant of the md5 path holds
    *    unchanged. One xxhash64 per shingle replaces one md5 — the md5
    *    evaluation is the dominant cost of the minhash/simhash queries at
    *    crawl scale (measured 14.0 s / 10.8 s at sf0.1). Engine-only (no
    *    SQL twin): spec-verified differentially — the estimator
    *    guarantees are hash-choice-independent, only which features map
    *    to which slots changes.
    *
    * Returns (pre, hA, hB): a shared per-feature pre-hash stage (so the
    * md5 digest is evaluated ONCE per shingle and sliced twice — the r3
    * one-md5 structure is preserved; for xxhash64 the stage is the
    * identity, two xxhash64 calls being cheaper than one md5) and the
    * two hash extractors over the staged column.
    */
  private def featureHashes(hashMode: String): (
      org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    hashMode match {
      case "md5" => (
        f => md5(f),
        m => conv(substring(m, 1, 15), 16, 10).cast("long"),
        m => shiftright(conv(substring(m, 17, 15), 16, 10).cast("long"), 7))
      case "xxhash64" => (
        f => f,
        m => xxhash64(m).bitwiseAND(lit((1L << 60) - 1)),
        m => shiftright(xxhash64(lit("km-b"), m).bitwiseAND(lit((1L << 60) - 1)), 7))
      case other => throw new IllegalArgumentException(
        s"hashMode must be md5 or xxhash64, got $other")
    }

  /** Exact dedup: group identical texts; keeper = min doc_id.
    * (doc_id, keeper, group_size) for EVERY doc — `doc_id != keeper`
    * rows are the deletions a pipeline would apply.
    *
    * ==Equality contract==
    * With `verify = false` (the default), "identical" means identical
    * under the fingerprint (sha256-prefix-128 as 16 raw bytes, character
    * length, xxhash64) — NOT a byte comparison. The shuffle key is ~29
    * bytes/doc, computed map-side, so grouping never ships document text
    * across the cluster
    * (grouping by `text` directly would shuffle bytes ≈ the corpus
    * size). The collision story is stated for dedup's actual threat
    * model — adversarial training corpora, where an attacker WANTS two
    * distinct documents merged so one becomes a deletion: the 128-bit
    * prefix of SHA-256 is collision-resistant (best known attack ≈ 2⁶⁴
    * work — generic birthday; no shortcut known), unlike md5 whose
    * chosen-prefix collisions are practical. Random corpora are covered
    * a fortiori (birthday bound ≈ n²/2¹²⁸).
    *
    * `verify = true` groups by the document text itself — byte-equality
    * semantics with zero hash assumptions, at the cost of shuffling the
    * corpus once — for pipelines that cannot accept any collision
    * argument. Both modes emit identical results on non-adversarial
    * data (the spec pins this).
    */
  /** The equality-fingerprint key columns (sha256-prefix-128 raw bytes,
    * character length, xxhash64, is-null flag) over `text` — the exact-
    * dedup shuffle key, shared by the batch path and the streaming path
    * ([[graft.streaming.EventStream.dedupStream]]) so the two contracts
    * cannot drift.
    */
  private[graft] def fingerprintKeyCols: Seq[org.apache.spark.sql.Column] = {
    val t = coalesce(col("text"), lit(""))
    Seq(
      // unhex → 16 raw bytes: BinaryType group keys are bit-compared,
      // and half the key width of the 32-char hex prefix.
      unhex(substring(sha2(t.cast("binary"), 256), 1, 32)).as("fp_sha"),
      length(t).as("fp_len"),
      xxhash64(t).as("fp_xx"),
      col("text").isNull.as("fp_null"))
  }
  private[graft] val fingerprintKeyNames = Seq("fp_sha", "fp_len", "fp_xx", "fp_null")

  def exact(docs: DataFrame, verify: Boolean = false): DataFrame = {
    if (verify) {
      // One corpus-sized shuffle; window partitioning keeps null texts in
      // their own group (SQL semantics: nulls group together) with no
      // null-unsafe join to drop them.
      val w = Window.partitionBy(col("text"))
      docs.select(
        col("doc_id"),
        min(col("doc_id")).over(w).as("keeper"),
        count(lit(1)).over(w).as("group_size"))
    } else {
      // NULL-safe: null fingerprint keys would survive the groupBy (null
      // is a group) but fall out of the null-UNSAFE equi-join back,
      // silently dropping null-text docs from the output. Fingerprint
      // over coalesce(text,'') and carry an is-null flag, so null texts
      // form their own group (distinct from '') and every doc_id appears
      // exactly once.
      val keyed = docs.select(col("doc_id") +: fingerprintKeyCols: _*)
      val groups = keyed
        .groupBy(fingerprintKeyNames.map(col): _*)
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("group_size"))
      keyed.join(groups, fingerprintKeyNames)
        .select(col("doc_id"), col("keeper"), col("group_size"))
    }
  }

  /** Pairwise word-n-gram Jaccard near-dup pairs with similarity ≥
    * threshold. Candidates = docs sharing ≥1 shingle (inverted-index
    * self-join on the shingle — an equi-join; a shingle shared by k docs
    * contributes k² candidate pairs, so extremely common shingles are
    * capped out by `maxDocFreq` like a stopword list).
    * Output: (a, b, jaccard) with a < b, jaccard rounded to 6 dp.
    *
    * `hashShingles = true` replaces the shingle STRING with its xxhash64
    * before the distinct + inverted-index join: the whole pipeline
    * (dedup, doc-freq cap, intersection counting) runs over 8-byte keys
    * instead of n-word strings, cutting the dominant shuffle's bytes
    * several-fold at crawl scale. Two distinct shingles colliding
    * (probability ≈ distinct²/2⁻⁶⁴ per corpus) would overcount one
    * intersection element — statistically invisible next to the
    * threshold; the default stays exact strings so the `d_ngram_jaccard`
    * oracle remains a string-for-string DuckDB replay.
    */
  def ngramJaccard(docs: DataFrame, n: Int = 3, threshold: Double = 0.2,
                   maxDocFreq: Long = 10000, hashShingles: Boolean = false): DataFrame =
    jaccardOfIndex(ngramIndex(docs, n, maxDocFreq, hashShingles), threshold)

  /** The shared inverted-index intersection both [[ngramJaccard]] and
    * [[containment]] project from: per-doc distinct-shingle counts and
    * per-unordered-pair intersection counts. Callers running BOTH
    * measures (the curation dashboard does) compute this once — the
    * intersection join is the whole cost; each measure after it is one
    * small join + a division.
    */
  final case class NgramIndex(sizes: DataFrame, inter: DataFrame)

  /** Per-doc-distinct shingle occurrences (doc_id, shingle) — the shared
    * front of [[ngramIndex]] and the calibration exact side. Per-doc
    * distinct via array_distinct BEFORE the explode: the "distinct
    * (doc_id, shingle) pairs" contract only dedups within a document
    * (doc_id is part of the key), so a map-side array dedup is exact and
    * removes what used to be a corpus-wide distinct exchange of every
    * shingle occurrence (guide §2.4).
    */
  def shingleOccurrences(docs: DataFrame, n: Int = 3,
                         hashShingles: Boolean = false): DataFrame = {
    val distinctShingles = array_distinct(TextOps.shinglesCol(col("text"), n))
    val exploded = docs
      .select(col("doc_id"), explode(distinctShingles).as("shingle"))
    if (hashShingles)
      exploded.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    else exploded
  }

  def ngramIndex(docs: DataFrame, n: Int = 3, maxDocFreq: Long = 10000,
                 hashShingles: Boolean = false): NgramIndex = {
    val sh = shingleOccurrences(docs, n, hashShingles)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Materialize before building the multi-scan plans on top: the
    // intersection join's first action scans `sh` three times (df
    // aggregate + both self-join sides), and concurrent scans of an
    // unmaterialized persisted frame each recompute it.
    sh.count()
    ngramIndexOfOccurrences(sh)
  }

  /** [[ngramIndex]] over an ALREADY-COMPUTED (and materialized — scanned
    * three times here) per-doc-distinct occurrence table: the
    * caller-shared face, so one shingle pass can feed the index AND the
    * calibration exact side.
    */
  def ngramIndexOfOccurrences(sh: DataFrame, maxDocFreq: Long = 10000): NgramIndex = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val rare = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") <= maxDocFreq),
      Seq("shingle"))
    val inter = rare.as("x").join(rare.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    NgramIndex(sizes, inter)
  }

  def jaccardOfIndex(idx: NgramIndex, threshold: Double): DataFrame =
    idx.inter
      .join(idx.sizes.select(col("doc_id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(idx.sizes.select(col("doc_id").as("b"), col("sz").as("szb")), Seq("b"))
      .select(col("a"), col("b"),
        // no round(): exact-int division is IEEE-identical across engines,
        // while rounding at dyadic midpoints (e.g. x/128) is not
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** MinHash signatures: (doc_id, sig array<long>) — sig(i) = min over the
    * doc's shingles of hᵢ(shingle). Same estimator family as the
    * reference's HLL register trick: per-slot min of a salted hash.
    *
    * The k salted hashes are derived by Kirsch–Mitzenmacher double
    * hashing, hᵢ = a + i·b, from the two HALVES of a single md5 per
    * shingle (hex digits 1–15 and 17–31 — md5 evaluation dominated the
    * r2 query cost, and two md5s per shingle measured ~2× one; the two
    * 60-bit halves of one digest are as independent as two digests for
    * the uniformity the estimator needs). `b` is shifted to 53 bits so
    * i·b (i < 128) cannot overflow a signed 64-bit value: overflow WRAPS
    * in Spark but ERRORS in DuckDB, and the whole point of the
    * md5-derived hash ([[TextOps.portableHash60]] family) is that the
    * oracle recomputes signatures bit-identically.
    */
  def minHashSignatures(docs: DataFrame, numHashes: Int = 32, shingleN: Int = 3,
                        hashMode: String = "md5"): DataFrame = {
    require(numHashes <= 128, "i*b stays below 2^60 only for i < 128")
    val (pre, hA, hB) = featureHashes(hashMode)
    // Two-step select: Catalyst's CollapseProject keeps non-cheap
    // expressions (md5) un-duplicated when referenced twice downstream,
    // so the digest is evaluated once per shingle row. array_distinct
    // first: min over a doc's shingle multiset equals min over its set,
    // and repeated shingles (boilerplate) would otherwise each pay an md5.
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(TextOps.shinglesCol(col("text"), shingleN))).as("shingle"))
      .select(col("doc_id"), pre(col("shingle")).as("m"))
      .select(col("doc_id"), hA(col("m")).as("ha"), hB(col("m")).as("hb"))
    val mins = (0 until numHashes).map(i =>
      min(col("ha") + lit(i.toLong) * col("hb")).as(s"h$i"))
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * `numHashes/bands` rows; docs agreeing on any whole band become
    * candidate pairs (equi-join on (band, bandHash) — no n² compare);
    * candidates are then verified with the signature-estimated Jaccard.
    * Output: (a, b, estJaccard) with a < b, est ≥ threshold.
    */
  def minHashLsh(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                 shingleN: Int = 3, threshold: Double = 0.5,
                 hashMode: String = "md5"): DataFrame = {
    val sigs = minHashSignatures(docs, numHashes, shingleN, hashMode)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sigs.count() // three downstream scans must not race the computation
    minHashLshOfSigs(sigs, numHashes, bands, threshold)
  }

  /** [[minHashLsh]] over an ALREADY-COMPUTED (and persisted — referenced
    * three times: banding + the two verify joins) signature table
    * (doc_id, sig). Signatures are per-document (min over the doc's own
    * shingles — no cross-doc state), so a caller may also FILTER a shared
    * corpus-wide signature table down to a sub-corpus and get exactly the
    * signatures a fresh run on that sub-corpus would compute; the gate's
    * d_minhash_lsh / d_minhash_est rows share one signature pass that
    * way (the second corpus hash pass was ~40% of each query's cost).
    */
  def minHashLshOfSigs(sigs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                       threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    // Band key = the band's raw slot values joined as a string: equality
    // is EXACTLY slot-tuple equality (no band-hash collisions), and it is
    // trivially portable to the SQL oracle.
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        concat_ws(",", (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*)): _*))
        .as(Seq("band", "bandKey")))
    val cands = banded.as("x").join(banded.as("y"), Seq("band", "bandKey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val est = cands
      .join(sigs.select(col("doc_id").as("a"), col("sig").as("siga")), Seq("a"))
      .join(sigs.select(col("doc_id").as("b"), col("sig").as("sigb")), Seq("b"))
      .select(col("a"), col("b"),
        round(size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), b => b))
          .cast("double") / lit(numHashes.toDouble), 6).as("estJaccard"))
    est.filter(col("estJaccard") >= threshold)
  }

  /** Sketch-calibration face: every LSH candidate pair with BOTH its
    * signature-estimated Jaccard and the exact shingle-set Jaccard —
    * the evaluation every production dedup pipeline runs (on a sample)
    * before picking `threshold`: the (est, exact) scatter is the
    * estimator's error profile at the corpus's real similarity mix.
    *
    * Scale shape: the [[minHashLsh]] candidate plan (threshold 0 keeps
    * every band collision), then the EXACT side is computed only for the
    * candidate pairs — two equi-joins of the candidate table against the
    * per-doc distinct-shingle table (never an all-pairs compare; the
    * fan-out is Σ_pairs |shingles(a)|, linear in candidate volume). A
    * band collision does not guarantee a shared shingle, so the
    * intersection is LEFT-joined and zero-filled.
    *
    * Output (a, b, estJaccard, jaccard, err = estJaccard − jaccard):
    * every term is either a 6-dp-rounded value, an exact-int IEEE
    * division, or their difference — bit-identical cross-engine.
    */
  def minHashAccuracy(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                      shingleN: Int = 3, hashMode: String = "md5"): DataFrame = {
    val sigs = minHashSignatures(docs, numHashes, shingleN, hashMode)
      .persist(StorageLevel.MEMORY_AND_DISK)
    sigs.count() // see minHashLsh
    minHashAccuracyOfSigs(sigs, docs, numHashes, bands, shingleN)
  }

  /** [[minHashAccuracy]] over a precomputed signature table for exactly
    * the docs in `docs` (see [[minHashLshOfSigs]] for the filter-sharing
    * contract). The exact-Jaccard side still shingles `docs` itself —
    * only the signature pass is shared.
    */
  def minHashAccuracyOfSigs(sigs: DataFrame, docs: DataFrame,
                            numHashes: Int = 32, bands: Int = 8,
                            shingleN: Int = 3,
                            /** Precomputed per-doc-distinct occurrence
                              * table ([[shingleOccurrences]], possibly
                              * hashed) for exactly the docs in `docs` —
                              * the caller-shared face (the gate shares
                              * one hashed shingle pass between the ngram
                              * index and this exact side). Must already
                              * be materialized; the caller owns its
                              * cache. Intersection/size counts are
                              * hash-choice-independent absent a 64-bit
                              * collision (the ngramIndex argument — the
                              * oracle gate checks the string-exact
                              * answer at both gate SFs).
                              */
                            shingles: Option[DataFrame] = None): DataFrame = {
    val cand = minHashLshOfSigs(sigs, numHashes, bands, threshold = 0.0)
    val sh = shingles.getOrElse {
      val s = shingleOccurrences(docs, shingleN)
        .persist(StorageLevel.MEMORY_AND_DISK)
      s.count() // sizes + the two intersection joins scan this 3×
      s
    }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand.select(col("a"), col("b"))
      .join(sh.select(col("doc_id").as("a"), col("shingle")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    cand
      .join(inter, Seq("a", "b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), Seq("b"))
      .select(col("a"), col("b"), col("estJaccard"),
        (col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
          .as("jaccard"))
      .withColumn("err", col("estJaccard") - col("jaccard"))
  }

  /** SimHash per document over word `shingleN`-gram features: bit j of
    * the hash = sign of Σ_features (bit j set ? +1 : −1). The feature
    * hash is the portable 60-bit md5 prefix (bits 60–63 are always 0 and
    * their sums always negative, so the simhash is effectively 60-bit —
    * the banding math below stays over the full 64-bit layout).
    */
  def simHash(docs: DataFrame, shingleN: Int = 2, hashMode: String = "md5"): DataFrame = {
    val (pre, hA, _) = featureHashes(hashMode)
    // array_distinct map-side replaces the corpus-wide distinct exchange
    // (per-doc dedup is exact for the (doc_id, f) key — ngramIndex note).
    val feats = docs.select(col("doc_id"),
      explode(array_distinct(TextOps.shinglesCol(col("text"), shingleN))).as("f"))
      .select(col("doc_id"), pre(col("f")).as("m"))
      .select(col("doc_id"), hA(col("m")).as("h"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    feats.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming`, banded by bit chunks and
    * verified by exact popcount of the XOR. (a, b, hamming).
    *
    * Candidate recall is guaranteed by pigeonhole: with `maxHamming + 1`
    * chunks, a pair within `maxHamming` differing bits MUST agree on at
    * least one whole chunk (maxHamming bits cannot touch maxHamming+1
    * disjoint chunks). The chunk count is therefore DERIVED from
    * `maxHamming` — a fixed 4-chunk banding would silently drop pairs at
    * Hamming ≥ 4 that differ in all four chunks.
    *
    * Banding runs over the EFFECTIVE 60 signature bits: [[simHash]]'s
    * bits 60–63 are constant 0, so a chunk that fell wholly inside them
    * would match every document against every other — a silent O(n²)
    * cross join at exactly the chunk counts (maxHamming ≥ 14) where
    * selectivity matters most. Differing bits only ever occur in 0–59,
    * so the pigeonhole argument is unchanged. Chunks shrink as
    * maxHamming grows (60/(h+1) bits each ⇒ coarser buckets, more
    * candidates); callers wanting web-scale selectivity should keep
    * maxHamming ≤ 3 (15-bit chunks).
    */
  /** N-gram CONTAINMENT — the asymmetric dedup signal Jaccard misses:
    * cont(a→b) = |sh(a) ∩ sh(b)| / |sh(a)| is ~1 when document a is a
    * quote/excerpt/boilerplate-wrap of b even though their Jaccard is
    * tiny (the big document dilutes the union). The curation action
    * differs too: containment says "drop the SMALLER doc", Jaccard says
    * "drop either". Output is ORDERED pairs (src_doc, dst_doc,
    * containment ≥ threshold).
    *
    * Same shuffle shape as [[ngramJaccard]] (shared inverted-index
    * intersection — one equi-join keyed by shingle with map-side-combined
    * pair counts, doc-freq cap bounding the quadratic); the ordered
    * expansion is a 2× projection of the unordered intersection table,
    * not a second join. Exact-integer IEEE division — no rounding needed
    * cross-engine.
    */
  def containment(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                  maxDocFreq: Long = 10000): DataFrame =
    containmentOfIndex(ngramIndex(docs, n, maxDocFreq), threshold)

  def containmentOfIndex(idx: NgramIndex, threshold: Double): DataFrame = {
    val ordered = idx.inter
      .select(col("a").as("src_doc"), col("b").as("dst_doc"), col("inter"))
      .union(idx.inter.select(col("b").as("src_doc"), col("a").as("dst_doc"), col("inter")))
    ordered
      .join(idx.sizes.select(col("doc_id").as("src_doc"), col("sz")), Seq("src_doc"))
      .select(col("src_doc"), col("dst_doc"),
        (col("inter").cast("double") / col("sz").cast("double")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  def simHashPairs(docs: DataFrame, shingleN: Int = 2, maxHamming: Int = 3,
                   hashMode: String = "md5"): DataFrame = {
    val sigs = simHash(docs, shingleN, hashMode).persist(StorageLevel.MEMORY_AND_DISK)
    sigs.count() // three downstream scans must not race the computation
    simHashPairsOf(sigs, maxHamming)
  }

  /** [[simHashPairs]] over an ALREADY-COMPUTED (and persisted — it is
    * referenced three times) signature table (doc_id, simhash): the
    * caller-shared face, so a pipeline computing signatures once can run
    * the pair join without re-hashing the corpus.
    */
  def simHashPairsOf(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigBits = 60 // simHash range: portable 60-bit hash, bits 60-63 = 0
    require(maxHamming >= 0 && maxHamming < 30,
      s"maxHamming=$maxHamming: need at least 2 bits per chunk over a $sigBits-bit simhash")
    val nChunks = maxHamming + 1
    val bits = sigBits / nChunks // floor; the last chunk takes the remainder
    // Cover all 60 meaningful bits: every POSSIBLY-differing bit lands in
    // exactly one chunk (pigeonhole stays valid).
    val mask = (w: Int) => (1L << w) - 1
    // Banding runs over DISTINCT signatures, not documents: a real corpus
    // (and the boilerplate-heavy synthetic one even more so) carries many
    // documents per signature, and doc-level banding would regenerate
    // every intra-bucket doc pair |group|² times. Signature-level
    // candidates are O(S²·selectivity); the doc expansion afterwards is
    // output-sized by definition. (Measured: 30.6 s → ~3 s at sf0.1.)
    val distinctSigs = sigs.select(col("simhash")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    distinctSigs.count() // chunked self-join scans this twice
    val chunked = distinctSigs.select(col("simhash"),
      posexplode(array((0 until nChunks).map { c =>
        val width = if (c == nChunks - 1) sigBits - c * bits else bits
        shiftright(col("simhash"), c * bits).bitwiseAND(lit(mask(width)))
      }: _*)).as(Seq("chunk", "v")))
    val sigPairs = chunked.as("x").join(chunked.as("y"), Seq("chunk", "v"))
      .filter(col("x.simhash") < col("y.simhash"))
      .select(col("x.simhash").as("s1"), col("y.simhash").as("s2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    // Cross-signature doc pairs: docs of s1 × docs of s2 (disjoint ids).
    val cross = sigPairs
      .join(sigs.select(col("simhash").as("s1"), col("doc_id").as("da")), Seq("s1"))
      .join(sigs.select(col("simhash").as("s2"), col("doc_id").as("db")), Seq("s2"))
      .select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"), col("hamming"))
    // Equal-signature doc pairs (hamming 0): intra-group self-join.
    val same = sigs.as("x").join(sigs.as("y"), Seq("simhash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        lit(0).cast("integer").as("hamming"))
    cross.union(same)
  }

  /** Span-level exact dedup (the sub-document member of the family —
    * CCNet-style shard dedup generalized from lines to token spans,
    * since crawl boilerplate repeats SPANS across pages): cut each
    * document into consecutive NON-overlapping `n`-token chunks (last
    * chunk may be shorter), then keep exactly ONE occurrence of each
    * distinct chunk corpus-wide — the first by (doc_id asc, chunk index
    * asc). Output is the per-document removal report:
    * (doc_id, n_chunks, n_kept); `n_chunks - n_kept` is how many spans a
    * rewrite pass would delete.
    *
    * Scale shape: chunks travel as [[TextOps.portableHash60]] hashes
    * (8 bytes), never text. Two map-side-combined aggregations: ONE
    * shuffle keyed by chunk hash (min(struct(doc_id, idx)) — associative,
    * partial map-side), then a per-doc count over ONE ROW PER DISTINCT
    * CHUNK (already ≤ corpus chunks, typically far fewer). The corpus
    * text itself never shuffles, mirroring [[exact]]'s fingerprint-first
    * design; the collision story is the shared 60-bit portable hash (an
    * adversarial-corpus deployment would swap in the 128-bit sha prefix
    * exactly as [[exact]] does).
    */
  /** The non-overlapping n-token chunk array of `text` (last chunk may
    * be shorter); shared by the span-dedup report and rewrite faces.
    */
  private def chunksCol(n: Int) =
    TextOps.bindOnce(TextOps.tokensCol(col("text"))) { w =>
      // ceil(len/n) chunk starts; slice is 1-based and clips the last chunk.
      when(size(w) > 0,
        transform(sequence(lit(0), floor((size(w) - 1) / lit(n)).cast("int")),
          i => concat_ws(" ", slice(w, i * n + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  /** (doc_id, idx) of every chunk occurrence that SURVIVES first-
    * occurrence-by-(doc_id, idx) dedup — the shared core of the two
    * span-dedup faces.
    */
  private def spanFirsts(docs: DataFrame, n: Int, hashMode: String): DataFrame = {
    val hash = TextOps.hash60(hashMode)
    docs
      .select(col("doc_id"), posexplode(chunksCol(n)).as(Seq("idx", "chunk")))
      .select(col("doc_id"), col("idx"), hash(col("chunk")).as("h"))
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("first"))
      .select(col("first.doc_id").as("doc_id"), col("first.idx").as("idx"))
  }

  def spanDedup(docs: DataFrame, n: Int = 5, hashMode: String = "md5"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val kept = spanFirsts(docs, n, hashMode)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept"))
    docs
      .select(col("doc_id"), size(chunksCol(n)).cast("long").as("n_chunks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("kept"), lit(0L)).as("n_kept"))
  }

  /** The REWRITE face of [[spanDedup]]: each document re-emitted with
    * only its surviving chunk occurrences, in original order —
    * (doc_id, new_text). A document whose every chunk was already seen
    * (or with no tokens) becomes the empty string. Whitespace is
    * normalized to single spaces (the chunking tokenizer's semantics);
    * `n_kept == 0` rows in the report face are exactly the docs a
    * pipeline would drop entirely after this rewrite.
    *
    * Scale shape: the only addition over the report face is one
    * per-doc `collect_list` of surviving chunk INDICES (ints, bounded
    * by chunks-per-doc — never text) and one join back to the corpus;
    * the rewrite itself is a pure array expression over the doc's own
    * chunks.
    */
  def spanDedupRewrite(docs: DataFrame, n: Int = 5, hashMode: String = "md5"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val keptIdx = spanFirsts(docs, n, hashMode)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("idx"))).as("__keep"))
    val chunks = chunksCol(n)
    docs
      .join(keptIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__keep").isNull, lit(""))
          .otherwise(concat_ws(" ",
            transform(
              filter(sequence(lit(0), size(chunks) - 1),
                i => array_contains(col("__keep"), i)),
              i => element_at(chunks, i + 1))))
          .as("new_text"))
  }

  /** MOSS-style copy-detection pairs over winnowing fingerprints
    * ([[TextOps.winnow]]): document pairs sharing at least `minShared`
    * fingerprints, counted over an inverted index capped at `maxDf` docs
    * per fingerprint. Winnowing guarantees any shared SUBSTRING of
    * length >= w+k-1 chars contributes a shared fingerprint, so this is
    * the character-level (copy/paste, boilerplate) complement to the
    * token-set similarity of [[ngramJaccard]].
    *
    * Output: (a, b, shared) with a < b — `shared` counts fingerprints
    * that survive the df cap, so it is a LOWER bound on true overlap;
    * the cap is what bounds the inverted-index self-join fan-out to
    * maxDf² pairs per fingerprint (the corpus-boilerplate fingerprints
    * that would otherwise produce quadratic pair blowup are exactly the
    * ones that carry no copy signal). Same scale shape as
    * [[ngramJaccard]]: explode → df filter → equi-join on fingerprint →
    * map-side-combined pair count.
    */
  /** Exact-substring duplication coverage — the per-document signal of
    * suffix-array dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): the fraction of token positions
    * covered by some sliding word n-gram that occurs at least twice
    * CORPUS-WIDE (any second occurrence counts, including within the
    * same document). Where [[spanDedup]]'s non-overlapping chunks dedup
    * at fixed alignments, the stride-1 window here detects a duplicated
    * run of ≥ n tokens at ANY alignment exactly — n-gram granularity is
    * the shuffle-friendly relaxation of the paper's arbitrary-length
    * suffix matching (runs shorter than n are ignored).
    *
    * Output (doc_id, n_tokens, covered_tokens, dup_frac): n_tokens NULL
    * for null text (the tokenizer's semantics, as in tokenStats);
    * dup_frac is ONE IEEE division of exact integers — bit-identical
    * cross-engine, deliberately NOT rounded (rounding reintroduces
    * dyadic-midpoint divergence).
    *
    * Scale shape: gram production is pure array expressions (zero
    * shuffle; the text never leaves its scan); the ONE wide shuffle
    * carries (doc_id, pos, hash60) gram occurrences keyed by hash for a
    * map-side-combined count; only occurrences of DUPLICATED grams — a
    * small fraction of a healthy corpus — fan out into ≤ n covered
    * positions each before the per-doc distinct. The occurrence table is
    * recomputed for the dup-side join rather than persisted: at crawl
    * scale it is ~corpus-sized, and a second columnar scan is cheaper
    * than caching it.
    */
  def dupCoverage(docs: DataFrame, n: Int = 5, hashMode: String = "md5"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val h = TextOps.hash60(hashMode)
    val grams = TextOps.bindOnce(TextOps.tokensCol(col("text"))) { w =>
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n), i =>
          struct(i.as("i"),
            h(concat_ws(" ", (1 to n).map(k => element_at(w, i + k)): _*)).as("h"))))
        .otherwise(array().cast("array<struct<i:int,h:bigint>>"))
    }
    val occ = docs
      .select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), col("g.i").as("i"), col("g.h").as("h"))
    val dup = occ.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("h"))
    val covered = occ.join(dup, Seq("h"))
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + (n - 1))).as("pos"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("covered_tokens"))
    docs
      .select(col("doc_id"),
        size(TextOps.tokensCol(col("text"))).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("dup_frac",
        when(col("n_tokens") > 0,
          col("covered_tokens").cast("double") / col("n_tokens"))
          .otherwise(when(col("n_tokens") === 0, lit(0.0))))
  }

  def winnowPairs(docs: DataFrame, k: Int = 8, w: Int = 4,
                  minShared: Int = 2, maxDf: Int = 1000,
                  hashMode: String = "md5"): DataFrame =
    winnowPairsFromFps(TextOps.winnow(docs, k, w, hashMode), minShared, maxDf)

  /** [[winnowPairs]] over a pre-computed (doc_id, fp) fingerprint set —
    * for callers that already hold one (the gate shares one winnow pass
    * between the fingerprint and pair queries).
    */
  def winnowPairsFromFps(fps: DataFrame, minShared: Int, maxDf: Int): DataFrame = {
    require(minShared >= 1 && maxDf >= 2)
    val rareFps = fps
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    val rare = fps.join(rareFps, Seq("fp"))
    rare.as("x").join(rare.as("y"), Seq("fp"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
