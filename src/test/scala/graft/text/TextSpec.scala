package graft.text

import graft.TestSpark
import graft.similarity.VectorSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object TextFixtures {
  /** Tiny corpus with exact dups, near dups, and distinct docs. */
  val corpus: Seq[(Long, String)] = Seq(
    0L -> "the quick brown fox jumps over the lazy dog near the river bank",
    1L -> "the quick brown fox jumps over the lazy dog near the river bank", // exact dup of 0
    2L -> "the quick brown fox jumps over the lazy dog near the river shore", // near dup of 0
    3L -> "a completely different document about spark catalyst optimizer rules",
    4L -> "spark catalyst optimizer rules are a completely different topic here",
    5L -> "short text")

  def df(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  def shingleSet(text: String, n: Int): Set[String] = {
    val w = text.split("\\s+").filter(_.nonEmpty)
    if (w.length < n) Set.empty
    else w.sliding(n).map(_.mkString(" ")).toSet
  }

  def jaccard(a: String, b: String, n: Int): Double = {
    val (sa, sb) = (shingleSet(a, n), shingleSet(b, n))
    if (sa.isEmpty && sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }
}

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TextFixtures._

  test("token stats match a plain Scala tokenizer") {
    val got = TextOps.tokenStats(df(spark)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    corpus.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      assert(got(id) == (toks.length.toLong, text.length.toLong), s"doc $id")
    }
  }

  test("shingles: n-grams in order; short docs yield empty array") {
    val sh = df(spark).select(col("doc_id"), TextOps.shinglesCol(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(5L) == Seq.empty)
    assert(sh(0L).toSet == shingleSet(corpus.head._2, 3))
    assert(sh(0L).head == "the quick brown")
  }

  test("entropy: closed-form goldens, empty/null excluded, sums to a Scala replay") {
    import spark.implicits._
    import graft.queries.TextQueries
    val docs = Seq(
      (0L, Some("aaaa")),        // 1 symbol  → 0 bits
      (1L, Some("abab")),        // 2 equiprobable → 1 bit
      (2L, Some("abcd")),        // 4 equiprobable → 2 bits
      (3L, Some("aab")),         // 2/3,1/3 → ~0.9183 bits
      (4L, Some("")),            // excluded
      (5L, Option.empty[String]) // excluded
    ).toDF("doc_id", "text")
    val got = TextQueries.entropyOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got(0L) == ((4L, 1L, -0.0)) || got(0L) == ((4L, 1L, 0.0)))
    assert(got(1L)._3 == 1.0 && got(1L)._2 == 2L)
    assert(got(2L)._3 == 2.0 && got(2L)._2 == 4L)
    val h3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3)) / math.log(2)
    assert(math.abs(got(3L)._3 - h3) < 1e-12, got(3L).toString)
    // differential on a longer mixed string vs a per-char Scala replay
    val s = "the quick brown fox jumps over the lazy dog, twice; the dog minds."
    val one = TextQueries.entropyOf(Seq((9L, s)).toDF("doc_id", "text")).head()
    val hist = s.groupBy(identity).view.mapValues(_.length.toDouble).values
    val want = -hist.map(c => c / s.length * math.log(c / s.length)).sum / math.log(2)
    assert(math.abs(one.getDouble(3) - want) < 1e-12)
    assert(one.getLong(2) == s.distinct.length.toLong)
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    import spark.implicits._
    val docs = Seq(
      (0L, "Hello  World"), (1L, "hello world"), (2L, " hello world "),
      (3L, "hello worlds")).toDF("doc_id", "text")
    val fp = TextOps.fingerprint(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) == fp(1L) && fp(1L) == fp(2L))
    assert(fp(0L) != fp(3L))
  }

  test("bpeTokensCol: alnum runs + single punctuation, portable extraction semantics") {
    import spark.implicits._
    val docs = Seq((0L, Some("Hello, world! x2")), (1L, Some("a-b_c")),
      (2L, Option.empty[String]), (3L, Some("   "))).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), TextOps.bpeTokensCol(col("text")).as("t"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[String](1).toList))).toMap
    assert(got(0L).contains(List("Hello", ",", "world", "!", "x2")))
    assert(got(1L).contains(List("a", "-", "b", "_", "c")))
    assert(got(2L).isEmpty, "null text must stay null (oracle parity)")
    assert(got(3L).contains(Nil), "whitespace-only text has zero subtokens")
  }

  test("langId picks the language with most stopword hits, ties lexical") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x the y and z is w of q"),
      (1L, "x der y und z die w nicht q"),
      (2L, "a le b et c les d est e"),
      (3L, "nothing matching any marker")).toDF("doc_id", "text")
    val got = TextOps.langId(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en" && got(1L) == "de" && got(2L) == "fr")
    assert(got(3L) == "de") // all-zero tie -> lexicographically first
  }
}

class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TextFixtures._

  /** Plain-Scala winnowing replay (hash values don't matter for the
    * structural properties, so a JVM hash stands in for portableHash60).
    */
  private def winnowScala(text: String, k: Int, w: Int,
                          h: String => Long): Set[Long] = {
    val s = text.toLowerCase
    if (s.length < k) Set.empty
    else {
      val hs = (0 to s.length - k).map(p => h(s.substring(p, p + k)))
      val starts = 0 to math.max(hs.length - w, 0)
      starts.map(st => hs.slice(st, st + w).min).toSet
    }
  }

  private def md5Hash60(g: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("winnow == Scala replay on the fixture corpus (incl. short and null docs)") {
    import spark.implicits._
    val withEdge = corpus ++ Seq(6L -> "tiny", 7L -> null, 8L -> "exactly8",
      9L -> "ninechars") // 8 chars = 1 k-gram (< w); 9 chars = 2 k-grams
    val got = TextOps.winnow(withEdge.toDF("doc_id", "text"), k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    withEdge.foreach { case (id, text) =>
      val want = if (text == null) Set.empty[Long]
                 else winnowScala(text, 8, 4, md5Hash60)
      assert(got.getOrElse(id, Set.empty[Long]) == want, s"doc $id")
    }
    assert(!got.contains(6L) && !got.contains(7L))
    assert(got(8L).size == 1) // min over the single k-gram
  }

  test("winnowing guarantee: shared substring >= w+k-1 chars ⇒ shared fingerprint; storage ~2/(w+1)") {
    // docs 0 and 1 are identical; 0 and 2 share a long prefix
    val f0 = winnowScala(corpus(0)._2, 8, 4, md5Hash60)
    val f2 = winnowScala(corpus(2)._2, 8, 4, md5Hash60)
    val f3 = winnowScala(corpus(3)._2, 8, 4, md5Hash60)
    assert((f0 intersect f2).nonEmpty) // near-dups share fingerprints
    assert((f0 intersect f3).isEmpty)  // unrelated docs don't
    // density: |fps| well under the k-gram count
    val m = corpus(0)._2.length - 7
    assert(f0.size < m && f0.size >= m * 2 / (4 + 1) / 2)
  }

  test("winnow hashMode=xxhash64 keeps the guarantee and density; md5 stays the gate default") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    def sets(mode: String): Map[Long, Set[Long]] =
      TextOps.winnow(df, k = 8, w = 4, hashMode = mode)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    val md = sets("md5")
    val xx = sets("xxhash64")
    // the winnowing GUARANTEE is hash-choice-independent: identical docs
    // (0,1) share every fingerprint, near-dups (0,2) share at least one,
    // unrelated (0,3) share none — in BOTH modes
    for (s <- Seq(md, xx)) {
      assert(s(0L) == s(1L))
      assert((s(0L) intersect s(2L)).nonEmpty)
      assert((s(0L) intersect s(3L)).isEmpty)
    }
    // only which grams win the window minima changes, not the ~2/(w+1)
    // density: per-doc set sizes agree within 50% across modes
    md.keySet.foreach { id =>
      val (a, b) = (md(id).size, xx(id).size)
      assert(a > 0 && b > 0 && math.abs(a - b) <= math.max(a, b) / 2, s"doc $id: md5=$a xx=$b")
    }
    // md5 is the default (the t_winnow oracle replays it); bad mode fails loudly
    assert(TextOps.winnow(df).collect().toSet ==
      TextOps.winnow(df, hashMode = "md5").collect().toSet)
    intercept[IllegalArgumentException](TextOps.winnow(df, hashMode = "sha1"))
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TextFixtures._

  test("exact dedup groups identical texts, keeper = min id") {
    val got = Dedup.exact(df(spark)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (0L, 2L) && got(1L) == (0L, 2L))
    assert(got(2L) == (2L, 1L) && got(5L) == (5L, 1L))
  }

  test("exact dedup keeps NULL-text docs: one group, distinct from empty string") {
    import spark.implicits._
    val docs = Seq((1L, Some("a")), (2L, None), (3L, None), (4L, Some("")), (5L, Some("a")))
      .toDF("doc_id", "text")
    val got = Dedup.exact(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), s"every doc_id must appear: $got")
    assert(got(2L) == (2L, 2L) && got(3L) == (2L, 2L), "nulls group together")
    assert(got(4L) == (4L, 1L), "empty string is its own group, not the null group")
    assert(got(1L) == (1L, 2L) && got(5L) == (1L, 2L))
  }

  test("exact dedup verify=true (byte-equality grouping) matches the fingerprint path") {
    import spark.implicits._
    def norm(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(norm(Dedup.exact(df(spark), verify = true)) == norm(Dedup.exact(df(spark))))
    val tricky = Seq((1L, Some("a")), (2L, None), (3L, None), (4L, Some("")),
      (5L, Some("a")), (6L, Some("b"))).toDF("doc_id", "text")
    assert(norm(Dedup.exact(tricky, verify = true)) == norm(Dedup.exact(tricky)),
      "verify path must keep null/empty group semantics identical")
  }

  test("ngramJaccard matches a brute-force oracle") {
    val got = Dedup.ngramJaccard(df(spark), n = 2, threshold = 0.05)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val want = (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      j = jaccard(ta, tb, 2) if j >= 0.05
    } yield (a, b) -> j).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"pair $k") }
  }

  test("ngramJaccard hashShingles mode: identical pairs and values (8-byte join keys)") {
    // Collision-free at any non-astronomical corpus, so the hashed-key
    // pipeline must be EXACTLY the string pipeline — same pairs, same
    // jaccard doubles — while the shuffle carries 8-byte keys.
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = norm(Dedup.ngramJaccard(df(spark), n = 2, threshold = 0.05))
    val hashed = norm(Dedup.ngramJaccard(df(spark), n = 2, threshold = 0.05,
      hashShingles = true))
    assert(hashed == exact)
  }

  test("minhash: identical docs → identical sigs; est tracks true jaccard") {
    val sigs = Dedup.minHashSignatures(df(spark), numHashes = 64, shingleN = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    def est(a: Long, b: Long) =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / 64
    val trueJ = jaccard(corpus(0)._2, corpus(2)._2, 2)
    assert(math.abs(est(0L, 2L) - trueJ) < 0.25) // 64 hashes → σ≈0.06
    assert(est(0L, 3L) < 0.2) // unrelated docs
  }

  test("minHashLsh finds exact+near dup pairs as candidates") {
    val pairs = Dedup.minHashLsh(df(spark), numHashes = 64, bands = 16,
      shingleN = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("simhash: equal for identical docs, near for near-dups, far for unrelated") {
    val h = Dedup.simHash(df(spark), shingleN = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(h(a) ^ h(b))
    assert(ham(0L, 1L) == 0)
    assert(ham(0L, 2L) < ham(0L, 3L))
    // The 4×16-bit banding GUARANTEES candidates only within hamming ≤ 3
    // (pigeonhole); exact dups are always found, and every returned pair
    // respects the threshold.
    val pairs = Dedup.simHashPairs(df(spark), shingleN = 2, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    assert(pairs.map(_._1).contains((0L, 1L)))
    assert(pairs.forall(_._2 <= 3))
  }

  test("xxhash64 production hash mode: minhash/simhash guarantees are hash-choice-independent") {
    // The fast mode swaps one md5 per shingle for one (resp. two)
    // xxhash64 — the estimator/banding guarantees must be unchanged,
    // only which features land in which slots. Identical docs stay
    // identical under any hash; near/far ordering is preserved; the
    // mode actually changes the hashes (the flag is not a no-op).
    val sigs = Dedup.minHashSignatures(df(spark), numHashes = 64, shingleN = 2,
      hashMode = "xxhash64")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs.values.forall(_.forall(v => v >= 0)), "60-bit range: nonneg in both engines")
    val sigsMd5 = Dedup.minHashSignatures(df(spark), numHashes = 64, shingleN = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) != sigsMd5(0L), "mode flag must switch the hash family")
    val pairs = Dedup.minHashLsh(df(spark), numHashes = 64, bands = 16,
      shingleN = 2, threshold = 0.3, hashMode = "xxhash64")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && !pairs.contains((0L, 3L)))
    val h = Dedup.simHash(df(spark), shingleN = 2, hashMode = "xxhash64")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(h(a) ^ h(b))
    assert(ham(0L, 1L) == 0)
    assert(ham(0L, 2L) < ham(0L, 3L))
    assert(h.values.forall(v => (v >>> 60) == 0L), "bits 60-63 stay 0: banding math unchanged")
    val sp = Dedup.simHashPairs(df(spark), shingleN = 2, maxHamming = 3,
      hashMode = "xxhash64")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sp.contains((0L, 1L)))
  }

  test("containment matches a brute-force oracle; excerpts score 1.0 one-way") {
    import spark.implicits._
    val got = Dedup.containment(df(spark), n = 2, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val want = (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a != b
      sa = shingleSet(ta, 2); sb = shingleSet(tb, 2)
      if sa.nonEmpty
      c = sa.intersect(sb).size.toDouble / sa.size if c >= 0.3
    } yield (a, b) -> c).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"pair $k") }

    // The asymmetry the operator exists for: a quote inside a larger doc
    // is fully contained one way, diluted the other; Jaccard sees neither.
    val excerpt = Seq(
      10L -> "alpha beta gamma delta",
      11L -> ("alpha beta gamma delta " +
        "epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containment(excerpt, n = 2, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((10L, 11L)) == 1.0)
    assert(!pairs.contains((11L, 10L)), "diluted direction must stay below threshold")
  }

  test("simHashPairs recall is COMPLETE at any maxHamming (pigeonhole banding)") {
    // Deterministic corpus of base docs + 2-word-mutated twins: twin pair
    // hamming distances spread over 4..10 (verified to include a pair
    // differing in all four 16-bit chunks). Brute-force ground truth vs
    // the banded operator.
    val words = Array("spark", "graph", "rank", "edge", "node", "scan", "join",
      "hash", "sort", "page", "link", "crawl", "text", "dedup", "band")
    val corpus = (0 until 20).flatMap { i =>
      val base = Array.tabulate(12)(p => words((i * 7 + p) % 15))
      val twin = base.clone()
      twin(i % 12) = words((i * 3 + 1) % 15)
      twin((i * 5 + 3) % 12) = words((i * 11 + 2) % 15)
      Seq((2L * i) -> base.mkString(" "), (2L * i + 1) -> twin.mkString(" "))
    }
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val h = Dedup.simHash(docs, shingleN = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxHamming = 10
    val want = (for {
      a <- h.keys; b <- h.keys if a < b
      d = java.lang.Long.bitCount(h(a) ^ h(b)) if d <= maxHamming
    } yield ((a, b), d)).toSet
    // The old fixed 4×16-bit banding dropped pairs at hamming 4..16 that
    // differ in all four chunks — require the fixture to contain one, so
    // this test actually pins that regression.
    def chunk16(x: Long, c: Int) = (x >>> (c * 16)) & 0xFFFFL
    val coversBug = want.exists { case ((a, b), d) =>
      d > 3 && (0 until 4).forall(c => chunk16(h(a), c) != chunk16(h(b), c))
    }
    assert(coversBug, "fixture must contain a >3-hamming pair differing in all 4 old chunks")
    val got = Dedup.simHashPairs(docs, shingleN = 2, maxHamming = maxHamming)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toSet
    assert(got == want)
  }
}

class VectorSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / math.max(na * nb, 1e-12)
  }

  lazy val embDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val vecs: Map[Long, Array[Float]] = embDf.collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("bruteForceTopK matches an exact Scala oracle on the testdata") {
    val got = VectorSim.bruteForceTopK(embDf, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val sample = vecs.keys.toSeq.sorted.take(25)
    sample.foreach { q =>
      val want = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          (id, BigDecimal(cosine(vecs(q), v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1)
      val gotTop = (1 to 3).map(r => got((q, r)))
      assert(gotTop == want, s"query $q")
    }
  }

  test("lshTopK: recall@5 rises as buckets coarsen (probe-1 IVF tradeoff)") {
    val brute = VectorSim.bruteForceTopK(embDf, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(bits: Int): Double = {
      val lsh = VectorSim.lshTopK(embDf, k = 5, dims = 64, bits = bits).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.intersect(lsh).size.toDouble / brute.size
    }
    val r2 = recall(2) // 4 buckets → ~1/4 of the n² work
    val r4 = recall(4) // 16 buckets → ~1/16 of the work
    assert(r2 > 0.3, s"recall@5(2 bits) = $r2")
    assert(r2 >= r4, s"coarser buckets must not lose recall: $r2 vs $r4")
  }

  test("multi-probe raises recall at fixed bits (isotropic testdata)") {
    val brute = VectorSim.bruteForceTopK(embDf, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallP(bits: Int, probe: Int): Double = {
      val lsh = VectorSim.lshTopK(embDf, k = 5, dims = 64, bits = bits, probe = probe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.intersect(lsh).size.toDouble / brute.size
    }
    val p0 = recallP(4, 0)
    val p1 = recallP(4, 1)
    assert(p1 > p0, s"probe-1 must beat probe-0: $p1 vs $p0")
  }

  test("planted near-duplicates: recall@1 ≥ 0.9 at bits=8 probe=1 (ANN's real workload)") {
    // Isotropic testdata caps recall at the candidate-sampling fraction
    // (cosine neighbors are barely above random); near-dup search — the
    // 100 TB dedup use case — has planted structure where selective
    // sign-LSH keeps recall high. 64 gaussian base vectors + twins at
    // cosine ≈ 0.999: per-plane flip prob ≈ θ/π ≈ 0.016, so P(bucket
    // within hamming ≤ 1) ≈ 0.99.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 64).flatMap { i =>
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val twin = v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      Seq((2L * i, v), (2L * i + 1, twin))
    }
    import spark.implicits._
    val planted = rows.toDF("vec_id", "embedding")
    val top1 = VectorSim.lshTopK(planted, k = 1, dims = 64, bits = 8, probe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 64).count(i => top1.get(2L * i).contains(2L * i + 1))
    assert(hits >= 58, s"planted near-dup recall@1: $hits/64")
  }

  test("autoBits: log-grown with corpus size, floored at 4, capped at dims/4") {
    assert(VectorSim.autoBits(1000, 64, 1024) == 4)
    assert(VectorSim.autoBits(1L << 20, 64, 1024) == 10)
    assert(VectorSim.autoBits(1000000000L, 64, 1024) == 16)
    assert(VectorSim.autoBits(0, 64, 1024) == 4)
  }

  /** Scala replay of the sign-LSH bucket id (block-sum signs). */
  private def bucketOf(v: Array[Float], bits: Int): Int = {
    val block = 64 / bits
    (0 until bits).map { b =>
      val s = v.slice(b * block, (b + 1) * block).map(_.toDouble).sum
      if (s >= 0) 1 << b else 0
    }.sum
  }

  test("nearDupPairs == brute-force threshold pairs restricted to the probe radius") {
    val got = VectorSim.nearDupPairs(embDf, threshold = 0.3, dims = 64,
        bits = 4, probe = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // no duplicates, a < b everywhere
    assert(got.keys.forall { case (a, b) => a < b })
    val ids = vecs.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      sim = BigDecimal(cosine(vecs(a), vecs(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if sim >= 0.3
      if Integer.bitCount(bucketOf(vecs(a), 4) ^ bucketOf(vecs(b), 4)) <= 1
    } yield (a, b) -> sim).toMap
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("embedNearDup: groups are the transitive closure; singletons keep themselves") {
    val out = graft.queries.TextQueries.embedNearDup(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == vecs.size)
    // union-find replay over the same candidate pairs at threshold 0.4
    val parent = scala.collection.mutable.Map(vecs.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    val ids = vecs.keys.toSeq.sorted
    for {
      a <- ids; b <- ids if a < b
      if Integer.bitCount(bucketOf(vecs(a), 4) ^ bucketOf(vecs(b), 4)) <= 1
      sim = BigDecimal(cosine(vecs(a), vecs(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if sim >= 0.4
    } { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val keeper = ids.map(i => i -> find(i)).toMap
    val sizes = keeper.groupBy(_._2).map { case (k, m) => k -> m.size.toLong }
    ids.foreach { i =>
      assert(out(i) == ((keeper(i), sizes(keeper(i)))), s"vec $i")
    }
    // every singleton keeps itself
    assert(out.collect { case (id, (k, 1L)) => id == k }.forall(identity))
  }

  test("nearDupPairs at an unreachable threshold yields no pairs and CC degrades to all-singletons") {
    import spark.implicits._
    val pairs = VectorSim.nearDupPairs(embDf, threshold = 0.999999,
      dims = 64, bits = 4, probe = 1)
    assert(pairs.isEmpty)
    // the CC-over-empty-graph path (what embedNearDup hits on a clean corpus)
    val g = graft.core.Graph.fromEdges(
      pairs.select(col("a").as("src"), col("b").as("dst")))
    val cc = graft.operators.ConnectedComponents.run(g).components
    assert(cc.isEmpty)
  }
}

class IvfSpec extends AnyFunSuite {
  import graft.similarity.Ivf
  lazy val spark = TestSpark.spark

  lazy val embDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("full probe (nprobe = nlist) is EXACTLY brute force — rank-for-rank") {
    // Probing every cell scans every candidate through the same rounded
    // cosine + tie-break, so the approximate path must reproduce the
    // exact baseline bit-for-bit, not just on recall.
    val brute = VectorSim.bruteForceTopK(embDf, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val ivf = Ivf.ivfTopK(embDf, k = 5, nlist = 8, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(ivf == brute)
  }

  test("recall@5 is monotone in nprobe and substantial at nprobe=4/16") {
    val brute = pairs(VectorSim.bruteForceTopK(embDf, k = 5))
    def recall(nprobe: Int): Double = {
      val got = pairs(Ivf.ivfTopK(embDf, k = 5, nlist = 16, nprobe = nprobe))
      brute.intersect(got).size.toDouble / brute.size
    }
    val r1 = recall(1); val r4 = recall(4)
    assert(r4 >= r1, s"more probes must not lose recall: $r4 vs $r1")
    assert(r4 > 0.25, s"recall@5(nprobe=4/16) = $r4") // ~25% corpus scanned
  }

  test("planted near-duplicates: trained cells keep twins together") {
    // Same workload model as the LSH planted test: 64 gaussian bases +
    // twins at cosine ≈ 0.999. A twin pair splits only when it straddles
    // a Voronoi boundary; probing 2/8 cells recovers most splits.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 64).flatMap { i =>
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val twin = v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      Seq((2L * i, v), (2L * i + 1, twin))
    }
    import spark.implicits._
    val planted = rows.toDF("vec_id", "embedding")
    val cents = Ivf.kmeans(planted, nlist = 8, iters = 2)
    val top1 = Ivf.ivfTopK(planted, k = 1, nlist = 8, nprobe = 2,
        centroids = Some(cents)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 64).count(i => top1.get(2L * i).contains(2L * i + 1))
    assert(hits >= 55, s"planted near-dup recall@1: $hits/64")
  }

  test("kmeans: Lloyd iterations do not worsen the spherical objective") {
    val seed = Ivf.seedCentroids(embDf, 16)
    val trained = Ivf.kmeans(embDf, nlist = 16, iters = 3)
    val before = Ivf.objective(embDf, seed)
    val after = Ivf.objective(embDf, trained)
    assert(after <= before + 1e-9, s"objective rose: $before -> $after")
  }

  test("seedCentroids: deterministic, ordered by vec_id, cid dense from 0") {
    val c1 = Ivf.seedCentroids(embDf, 5)
    val c2 = Ivf.seedCentroids(embDf, 5)
    assert(c1.map(_.cid) == (0 until 5))
    assert(c1.zip(c2).forall { case (a, b) => a.vec.sameElements(b.vec) })
  }

  test("assign: every vector exactly once, ties to smallest cid, sim matches a replay") {
    import spark.implicits._
    // Two identical unit centroids force a tie on every row → cid 0 wins;
    // a third orthogonal centroid must capture its own axis.
    val cents = Seq(
      Ivf.Centroid(0, Array(1f, 0f, 0f)),
      Ivf.Centroid(1, Array(1f, 0f, 0f)),
      Ivf.Centroid(2, Array(0f, 1f, 0f)))
    val vecs = Seq(
      (1L, Array(2f, 0f, 0f)),   // exact tie between cid 0 and 1
      (2L, Array(0f, 3f, 0f)),   // cid 2's axis
      (3L, Array(1f, 1f, 0f)))   // cos ≈ 0.707107 to ALL three → rounded tie → cid 0
    val got = Ivf.assign(vecs.toDF("vec_id", "embedding"), cents)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got(1L) == ((0, 1.0)), s"tie must break to cid 0: ${got(1L)}")
    assert(got(2L) == ((2, 1.0)), got(2L).toString)
    assert(got(3L)._1 == 0 && math.abs(got(3L)._2 - 0.707107) < 1e-9, got(3L).toString)
    assert(got.size == 3)
  }

  test("kmeans(iters=1) + assign: members sit no farther from their trained center than the seed one") {
    val seed = Ivf.seedCentroids(embDf, 8)
    val trained = Ivf.kmeans(embDf, nlist = 8, iters = 1)
    assert(trained.map(_.cid) == (0 until 8), "cid set must be preserved")
    val seedObj = Ivf.objective(embDf, seed)
    val trainedObj = Ivf.objective(embDf, trained)
    assert(trainedObj <= seedObj + 1e-9, s"one Lloyd step worsened: $seedObj -> $trainedObj")
    // assignment totals: every vector lands in exactly one cell
    val n = embDf.count()
    val assigned = Ivf.assign(embDf, trained)
    assert(assigned.count() == n)
    assert(assigned.select("vec_id").distinct().count() == n)
  }
}
