package graft.ingest

import java.nio.file.{Files, Paths}

/** Sequential decoder for the public BVGraph format, version 0, with the
  * default codings (γ outdegrees, unary references, γ block counts and
  * blocks, γ intervals, ζ_k residuals, big-endian bit order) — the exact
  * configuration of the reference's bundled real-web-graph goldens
  * (`/root/reference/tests/graphs/cnr-2000.properties`: version=0,
  * windowsize=7, minintervallength=4, zetak=3, compressionflags empty).
  *
  * The format is public: Boldi & Vigna, "The WebGraph Framework I:
  * Compression Techniques" (WWW 2004) defines the reference/copy-block +
  * interval + residual scheme and the instantaneous codes; the
  * `it.unimi.dsi.webgraph.BVGraph` javadoc documents the on-disk layout
  * and the `.properties` keys. This is a from-scratch implementation of
  * that spec — nothing here is a port of the reference's Rust decoder
  * (which is a memory-mapped, code-table-accelerated random-access
  * reader; this is a plain sequential one, all the golden replay needs).
  *
  * Per node `x` the stream carries:
  *  1. outdegree d          — γ; if 0, done;
  *  2. reference r          — unary (window > 0); if r > 0, part of the
  *     list is copied from node x−r via alternating copy/skip blocks:
  *     block count γ; block 0 length γ, later lengths γ−1; blocks
  *     alternate copied/skipped starting copied; the implicit final
  *     block (to the end of the reference list) is copied iff the block
  *     count is even;
  *  3. intervals            — count γ; first left extreme = x + nat2int(γ),
  *     lengths γ + minIntervalLength, later lefts gap-coded γ + 1;
  *  4. residuals            — whatever remains of d: first = x +
  *     nat2int(ζ_k), later gaps ζ_k + 1.
  * The successor list is the merge of the three (disjoint, each sorted).
  */
object BvGraphReader {

  /** MSB-first bit reader over an in-memory byte array (BVGraph streams
    * are big-endian: the first bit of the stream is the high bit of
    * byte 0). Instantaneous codes as defined in the WebGraph paper §3.
    */
  final class BitReader(bytes: Array[Byte]) {
    private var bitPos: Long = 0L
    def position: Long = bitPos

    def readBit(): Int = {
      val b = (bytes((bitPos >>> 3).toInt) >> (7 - (bitPos & 7)).toInt) & 1
      bitPos += 1
      b
    }

    /** Number of 0-bits before (and consuming) the terminating 1. */
    def readUnary(): Int = {
      var n = 0
      while (readBit() == 0) n += 1
      n
    }

    /** Next `width` bits as an unsigned value (0 bits → 0, no read). */
    def readBits(width: Int): Long = {
      var v = 0L
      var i = 0
      while (i < width) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** Elias γ: unary length h, then h bits; value = (1<<h | bits) − 1. */
    def readGamma(): Long = {
      val h = readUnary()
      ((1L << h) | readBits(h)) - 1
    }

    /** ζ_k (Boldi–Vigna): unary h; left = 2^(hk); m = next hk+k−1 bits;
      * value = m + left − 1 if m < left, else (m<<1 | bit) − 1.
      */
    def readZeta(k: Int): Long = {
      val h = readUnary()
      val left = 1L << (h * k)
      val m = readBits(h * k + k - 1)
      if (m < left) m + left - 1
      else (m << 1) + readBit() - 1
    }
  }

  /** Inverse of the int-to-natural bijection used for the first interval
    * extreme and first residual (they may precede x): even n → n/2,
    * odd n → −(n+1)/2.
    */
  def nat2int(n: Long): Long = (n >>> 1) ^ -(n & 1L)

  final case class Props(
      nodes: Int,
      arcs: Long,
      windowSize: Int,
      minIntervalLength: Int,
      zetaK: Int
  )

  def readProperties(path: String): Props = {
    val p = new java.util.Properties()
    val in = Files.newInputStream(Paths.get(path))
    try p.load(in) finally in.close()
    def get(k: String): String = {
      val v = p.getProperty(k)
      require(v != null, s"$path: missing property $k")
      v.trim
    }
    require(get("version") == "0", s"unsupported BVGraph version ${get("version")}")
    require(get("graphclass").endsWith("BVGraph"), s"not a BVGraph: ${get("graphclass")}")
    val flags = Option(p.getProperty("compressionflags")).map(_.trim).getOrElse("")
    // Default codings only. RESIDUALS_ZETA spelled out IS the default.
    require(flags.isEmpty || flags == "RESIDUALS_ZETA",
      s"unsupported compressionflags '$flags' (default codings only)")
    Props(
      nodes = get("nodes").toInt,
      arcs = get("arcs").toLong,
      windowSize = get("windowsize").toInt,
      minIntervalLength = get("minintervallength").toInt,
      zetaK = get("zetak").toInt)
  }

  /** Decode `<basename>.graph` (+ `.properties`) into per-node successor
    * arrays, index = node id. Sequential single pass; validates that the
    * total decoded arc count matches the properties file and that every
    * list is strictly increasing within [0, n).
    */
  def decode(basename: String): Array[Array[Int]] = {
    val props = readProperties(s"$basename.properties")
    val bytes = Files.readAllBytes(Paths.get(s"$basename.graph"))
    val in = new BitReader(bytes)
    val n = props.nodes
    val win = props.windowSize
    val out = new Array[Array[Int]](n)
    var totalArcs = 0L

    var x = 0
    while (x < n) {
      val d = in.readGamma().toInt
      if (d == 0) {
        out(x) = Array.emptyIntArray
      } else {
        var copied: Array[Int] = Array.emptyIntArray
        var extra = d
        if (win > 0) {
          val ref = in.readUnary()
          if (ref > 0) {
            val refList = out(x - ref)
            val blockCount = in.readGamma().toInt
            val blocks = new Array[Int](blockCount)
            var total = 0
            var copiedLen = 0
            var i = 0
            while (i < blockCount) {
              blocks(i) = in.readGamma().toInt + (if (i == 0) 0 else 1)
              total += blocks(i)
              if ((i & 1) == 0) copiedLen += blocks(i)
              i += 1
            }
            if ((blockCount & 1) == 0) copiedLen += refList.length - total
            copied = new Array[Int](copiedLen)
            var src = 0
            var dst = 0
            var b = 0
            while (src < refList.length) {
              val take = if (b < blockCount) blocks(b) else refList.length - src
              if ((b & 1) == 0) {
                System.arraycopy(refList, src, copied, dst, take)
                dst += take
              }
              src += take
              b += 1
            }
            extra = d - copiedLen
          }
        }

        var intervals: Array[Int] = Array.emptyIntArray
        if (extra > 0 && props.minIntervalLength != 0) {
          val intervalCount = in.readGamma().toInt
          if (intervalCount > 0) {
            val lefts = new Array[Int](intervalCount)
            val lens = new Array[Int](intervalCount)
            var prev = x + nat2int(in.readGamma())
            var totalLen = 0
            var i = 0
            while (i < intervalCount) {
              if (i > 0) prev += in.readGamma() + 1
              lefts(i) = prev.toInt
              lens(i) = in.readGamma().toInt + props.minIntervalLength
              totalLen += lens(i)
              prev += lens(i)
              i += 1
            }
            intervals = new Array[Int](totalLen)
            var k = 0
            i = 0
            while (i < intervalCount) {
              var v = lefts(i)
              val end = lefts(i) + lens(i)
              while (v < end) { intervals(k) = v; k += 1; v += 1 }
              i += 1
            }
            extra -= totalLen
          }
        }

        val residuals = new Array[Int](math.max(extra, 0))
        if (extra > 0) {
          var prev = x + nat2int(in.readZeta(props.zetaK))
          residuals(0) = prev.toInt
          var i = 1
          while (i < extra) {
            prev += in.readZeta(props.zetaK) + 1
            residuals(i) = prev.toInt
            i += 1
          }
        }

        val merged = merge3(copied, intervals, residuals)
        require(merged.length == d, s"node $x: decoded ${merged.length} of $d successors")
        var i = 1
        var ok = merged(0) >= 0 && merged(merged.length - 1) < n
        while (ok && i < merged.length) { ok = merged(i - 1) < merged(i); i += 1 }
        require(ok, s"node $x: successor list not strictly increasing in [0,$n)")
        out(x) = merged
        totalArcs += d
      }
      x += 1
    }
    require(totalArcs == props.arcs,
      s"$basename: decoded $totalArcs arcs, properties say ${props.arcs}")
    out
  }

  /** Merge three individually sorted, mutually disjoint int arrays. */
  private def merge3(a: Array[Int], b: Array[Int], c: Array[Int]): Array[Int] = {
    val out = new Array[Int](a.length + b.length + c.length)
    var ia = 0; var ib = 0; var ic = 0; var k = 0
    while (k < out.length) {
      val va = if (ia < a.length) a(ia) else Int.MaxValue
      val vb = if (ib < b.length) b(ib) else Int.MaxValue
      val vc = if (ic < c.length) c(ic) else Int.MaxValue
      if (va <= vb && va <= vc) { out(k) = va; ia += 1 }
      else if (vb <= vc) { out(k) = vb; ib += 1 }
      else { out(k) = vc; ic += 1 }
      k += 1
    }
    out
  }

  /** The decoded graph as an edge list (src, dst) — the shape
    * [[graft.core.Graph.fromEdges]] ingests.
    */
  def edges(basename: String): Array[(Long, Long)] = {
    val adj = decode(basename)
    val out = new Array[(Long, Long)](adj.iterator.map(_.length.toLong).sum.toInt)
    var k = 0
    var x = 0
    while (x < adj.length) {
      val dsts = adj(x)
      var i = 0
      while (i < dsts.length) { out(k) = (x.toLong, dsts(i).toLong); k += 1; i += 1 }
      x += 1
    }
    out
  }
}
