package graft.similarity

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val embDf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("seed codebooks: shape, float-truncated unit slices, determinism") {
    val cb = Pq.seedCodebooks(embDf, m = 4, ksub = 8)
    assert(cb.m == 4 && cb.ksub == 8 && cb.dsub == 16)
    assert(cb.cents.forall(_.forall(_.length == 16)))
    val cb2 = Pq.seedCodebooks(embDf, m = 4, ksub = 8)
    assert((0 until 4).forall(j => (0 until 8).forall(c =>
      cb.cents(j)(c).sameElements(cb2.cents(j)(c)))))
  }

  test("a seed vector encodes to its own codes (exact reconstruction)") {
    // Seed vector c's subvector IS codebook entry c in every subspace,
    // so argmax(dot − ‖cent‖²/2) = c there (score  0.5·‖sub‖² beats every
    // other entry by Cauchy–Schwarz unless two seeds tie exactly).
    val cb = Pq.seedCodebooks(embDf, m = 4, ksub = 8)
    val seedIds = embDf.orderBy($"vec_id".asc).limit(8)
      .select($"vec_id").collect().map(_.getLong(0))
    val codes = Pq.encode(embDf, cb)
      .filter($"vec_id".isin(seedIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    seedIds.zipWithIndex.foreach { case (id, c) =>
      assert(codes(id).forall(_ == c), s"seed $id should encode to (${c},${c},${c},${c}), got ${codes(id)}")
    }
  }

  test("identical vectors share codes and score ADC sim 1.0 against each other") {
    val base = embDf.select($"vec_id", $"embedding").limit(30)
    val dup = base.select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val both = base.union(dup)
    val cb = Pq.seedCodebooks(both, m = 4, ksub = 8)
    val codes = Pq.encode(both, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val got = Pq.ivfPqTopK(both, k = 1, nlist = 4, nprobe = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    base.collect().map(_.getLong(0)).foreach { id =>
      // identical input ⇒ identical codes (deterministic encode) …
      assert(codes(id) == codes(id + 100000L), s"dup of $id must share codes")
      // … and the top-1 scores a full 1.0 (possibly via ANOTHER vector
      // that quantizes to the same 4 codes — with ksub=8 the code space
      // is deliberately coarse; ties break to the smaller nbr_id).
      val (nbr, sim) = got(id)
      assert(sim == 1.0, s"top-1 of $id should reach ADC sim 1.0, got ($nbr, $sim)")
      assert(codes(nbr) == codes(id), "a sim-1.0 neighbor must share all codes")
    }
  }

  test("ADC sim equals the true (rounded) cosine of the RECONSTRUCTIONS") {
    // Decode codes back to reconstruction vectors in the test, compute
    // their exact cosine, and compare against the engine's LUT path.
    val cb = Pq.seedCodebooks(embDf, m = 4, ksub = 8)
    val enc = Pq.encode(embDf, cb).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toArray, r.getDouble(2)))
    def recon(codes: Array[Int]): Array[Double] =
      (0 until 4).flatMap(j => cb.cents(j)(codes(j)).map(_.toDouble)).toArray
    val sample = enc.take(20)
    for ((ida, ca, rqa) <- sample; (idb, cbd, rqb) <- sample if ida < idb) {
      val (ra, rb) = (recon(ca), recon(cbd))
      val dot = ra.zip(rb).map { case (x, y) => x * y }.sum
      val want = BigDecimal(dot / math.max(rqa * rqb, 1e-12))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val gotSim = {
        val d = (0 until 4).map(j => cb.lut(j, ca(j), cbd(j))).sum
        BigDecimal(d / math.max(rqa * rqb, 1e-12))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(math.abs(gotSim - want) <= 1e-6, s"pair ($ida,$idb)")
    }
  }
}
