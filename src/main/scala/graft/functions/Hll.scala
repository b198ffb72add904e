package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** HyperLogLog kernel, semantics matching the reference's
  * `hyper_log_log_logic.rs` (SURVEY §2.4):
  *
  *  - m = 2^log2m registers; for an added 64-bit hash h:
  *    j = h & (m−1);  ρ = trailing-zeros(h >>> log2m | sentinel) + 1;
  *    reg[j] = max(reg[j], ρ)   (reference :151-167)
  *  - estimate = α_m·m²/Σ 2^(−reg[j]), with the small-range linear-counting
  *    branch m·ln(m/V) when V = #zero-registers > 0 and est ≤ 2.5m
  *    (reference :169-186)
  *  - α table: m=16→0.673, 32→0.697, 64→0.709, else 0.7213/(1+1.079/m)
  *    (reference :388-393); m ≥ 16 enforced (:379-383)
  *
  * Registers are one byte each (the reference packs b-bit registers into
  * words as a space optimization — semantically identical; 8 bits covers
  * ρ ≤ 64−log2m+1 for any m). Merge = register-wise max: commutative,
  * associative, idempotent — so distributed merge order cannot change
  * results, and Spark runs vs a sequential oracle are BIT-IDENTICAL
  * (the property the reference's own par-vs-seq test asserts,
  * `hyperball_impl.rs:1263-1322`).
  *
  * The hash is a 64-bit avalanche mix of (seed, value) — the reference
  * uses seeded Jenkins for parity with Java-webgraph goldens we cannot
  * read (BV format); any good 64-bit hash preserves every statistical
  * guarantee tested here.
  */
object HllLogic extends Serializable {

  /** 64-bit mix (splitmix64 finalizer — public domain constant set). */
  def hash(seed: Long, x: Long): Long = {
    var z = x + seed * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Bob Jenkins's 64-bit mix exactly as the Java webgraph HLL uses it
    * (dsiutils `HyperLogLogCounterArray.jenkins`; the reference
    * reimplements the same function for its Java-golden parity tests,
    * `tests/test_hyperball.rs:23-153`): state a = b = seed,
    * c = 0x9e3779b97f4a7c13 (the 64-bit golden ratio), one-word digest of
    * x (a += x, then the 12-step subtract/xor avalanche), result = c.
    * Selecting this hasher makes a HyperBall run REPLAYABLE against
    * Java-webgraph goldens (the one reference test family the default
    * splitmix64 mode can never replay — accepted-deviation note in
    * SURVEY §2.3) should a decodable golden graph ever land.
    */
  def hashJenkins(seed: Long, x: Long): Long = {
    var a = seed + x
    var b = seed
    var c = 0x9E3779B97F4A7C13L
    a -= b; a -= c; a ^= (c >>> 43)
    b -= c; b -= a; b ^= (a << 9)
    c -= a; c -= b; c ^= (b >>> 8)
    a -= b; a -= c; a ^= (c >>> 38)
    b -= c; b -= a; b ^= (a << 23)
    c -= a; c -= b; c ^= (b >>> 5)
    a -= b; a -= c; a ^= (c >>> 35)
    b -= c; b -= a; b ^= (a << 49)
    c -= a; c -= b; c ^= (b >>> 11)
    a -= b; a -= c; a ^= (c >>> 12)
    b -= c; b -= a; b ^= (a << 18)
    c -= a; c -= b; c ^= (b >>> 22)
    c
  }

  def numRegisters(log2m: Int): Int = {
    require(log2m >= 4, "reference enforces m >= 16 registers")
    1 << log2m
  }

  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1 + 1.079 / m)
  }

  def empty(log2m: Int): Array[Byte] = new Array[Byte](numRegisters(log2m))

  def add(regs: Array[Byte], hashed: Long, log2m: Int): Unit = {
    val m = regs.length
    val j = (hashed & (m - 1)).toInt
    // sentinel bit caps rho at (64 - log2m) + 1 like the reference
    val w = (hashed >>> log2m) | (1L << (64 - log2m))
    val rho = (java.lang.Long.numberOfTrailingZeros(w) + 1).toByte
    if (regs(j) < rho) regs(j) = rho
  }

  def addValue(regs: Array[Byte], value: Long, log2m: Int, seed: Long = 42L,
               jenkins: Boolean = false): Unit =
    add(regs, if (jenkins) hashJenkins(seed, value) else hash(seed, value), log2m)

  def init(value: Long, log2m: Int, seed: Long = 42L, jenkins: Boolean = false): Array[Byte] = {
    val r = empty(log2m)
    addValue(r, value, log2m, seed, jenkins)
    r
  }

  private val LONG_VIEW = java.lang.invoke.MethodHandles
    .byteArrayViewVarHandle(classOf[Array[Long]], java.nio.ByteOrder.LITTLE_ENDIAN)
  private final val HIGH = 0x8080808080808080L
  private final val LOW = 0x0101010101010101L

  /** Register-wise max, into a fresh array.
    *
    * Word-parallel (SWAR) over 8 registers per long — the same published
    * branch-free trick as the reference's carry-propagation merge
    * (`hyper_log_log_logic.rs:469-576`), specialized to byte-wide
    * registers: values are ρ ≤ 64−log2m+1 < 128, so the high guard bit
    * of each byte lane absorbs the subtraction borrow and
    * `(a|H) − b` leaves lane-wise a≥b flags in the guard bits; the flags
    * expand to 0x00/0xFF select masks without cross-lane carries.
    * Register counts are powers of two ≥ 16, so the array is always a
    * whole number of longs (byte tail kept for safety).
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    // Mismatched log2m sketches (reachable from SQL: hll_merge2(
    // hll_init(x,6), hll_init(y,7))) would otherwise silently truncate
    // one side or throw an opaque ArrayIndexOutOfBounds mid-loop.
    require(a.length == b.length,
      s"hll merge: incompatible register counts ${a.length} vs ${b.length} (different log2m)")
    val out = new Array[Byte](a.length)
    val n8 = a.length & ~7
    var i = 0
    while (i < n8) {
      val la = LONG_VIEW.get(a, i).asInstanceOf[Long]
      val lb = LONG_VIEW.get(b, i).asInstanceOf[Long]
      val ge = ((la | HIGH) - lb) >>> 7 & LOW // 1 per lane where a >= b
      val mask = (ge << 8) - ge               // 0xFF per selected lane
      LONG_VIEW.set(out, i, lb ^ ((la ^ lb) & mask))
      i += 8
    }
    while (i < a.length) {
      out(i) = if (a(i) >= b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  def count(regs: Array[Byte]): Double = {
    val m = regs.length
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val est = alpha(m) * m * m / invSum
    if (zeros > 0 && est <= 2.5 * m) m * math.log(m.toDouble / zeros) else est
  }
}

/** Spark surface for the HLL kernel: native Catalyst scalar expressions
  * ([[HllExpressions]] — codegen'd, no ScalaUDF on HyperBall's hot loop)
  * + a merge Aggregator for `groupBy().agg()`. Registers travel as
  * BinaryType.
  */
object Hll {
  import org.apache.spark.sql.GraftSql.{column, expression}

  /** Aggregator: register-wise max over a group of register arrays. */
  class MergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(buf: Array[Byte], a: Array[Byte]): Array[Byte] =
      if (buf.isEmpty) a else HllLogic.merge(buf, a)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b else if (b.isEmpty) a else HllLogic.merge(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private val mergeUdaf =
    org.apache.spark.sql.functions.udaf(new MergeAgg, Encoders.BINARY)

  /** groupBy aggregation: union (register-wise max) of HLL sketches. */
  def hllMergeAgg(regs: Column): Column = mergeUdaf(regs)

  def hllInit(log2m: Int, seed: Long = 42L, jenkins: Boolean = false): Column => Column =
    (id: Column) => column(HllExpressions.HllInitExpr(expression(id), log2m, seed, jenkins))

  /** Binary merge of two sketches (either side may be null). */
  val hllMerge2: (Column, Column) => Column =
    (a, b) => column(HllExpressions.HllMerge2Expr(expression(a), expression(b)))

  val hllCount: Column => Column =
    r => column(HllExpressions.HllCountExpr(expression(r)))
}
