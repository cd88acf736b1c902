package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Baseline-JPEG (ITU T.81) grayscale pixel decode — the entropy tier of
  * the last codec stub made real. The kernel runs the actual decoder
  * machinery a baseline JPEG needs:
  *
  *  - segment walk (SOI, DQT, SOF0, DHT, SOS, EOI) with length-checked
  *    reads, restricted to the honest envelope: 8-bit precision, ONE
  *    component (grayscale), no subsampling, baseline Huffman;
  *  - canonical JPEG Huffman table construction from the file's own DHT
  *    (BITS[1..16] + HUFFVAL), MSB-first bit reads with 0xFF00 byte
  *    de-stuffing;
  *  - per-block DC difference decoding (category + signed-magnitude
  *    extension, cross-block DC prediction) and full AC run-length
  *    decoding (EOB, ZRL, run/size pairs) — coefficients are counted and
  *    dequantized;
  *  - reconstruction: dequantized coefficients through the 2-D inverse
  *    DCT (double-precision reference IDCT, rounded and clamped), level
  *    shift +128, edge blocks cropped to the declared geometry.
  *
  * The spec's honest corner: T.81 does NOT mandate a bit-exact IDCT, so
  * decoders may disagree by ±1 on blocks with AC energy. The fixture
  * tables (MediaSynth.jpeg) therefore plant DC-ONLY blocks — flat 8×8
  * patches whose reconstruction (DC·Q/8 + 128) is exact in every
  * conforming decoder — which is what lets the DuckDB oracle recompute
  * the sums from the planted formulas and MultimodalSpec pin ImageIO
  * parity byte-for-byte. Blocks with AC coefficients still decode (the
  * entropy layer is complete); they are simply not what the oracle
  * exercises, and `n_ac_coeffs` reports their presence.
  *
  * Null/integrity semantics follow the PNG kernel: junk or truncated
  * payloads return all-null fields, a malformed entropy stream nulls the
  * sums, and nothing ever throws on hostile input.
  */
object JpegDecode {

  val outType: StructType = StructType(Seq(
    StructField("w", IntegerType), StructField("h", IntegerType),
    StructField("n_blocks", LongType),
    StructField("sum_luma", LongType), StructField("wsum_luma", LongType),
    StructField("n_ac_coeffs", LongType)))

  private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xFF
  private def beU16(p: Array[Byte], i: Int): Int = (u8(p, i) << 8) | u8(p, i + 1)

  /** Canonical JPEG Huffman table (T.81 Annex C): decode one symbol via
    * per-length min-code/max-code/value-pointer arrays, MSB-first.
    */
  private final class JHuff(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17) // -1 = no codes at this length
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) maxCode(l) = -1
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l)
          k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** -1 on no match within 16 bits or bit starvation. */
    def decode(r: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = r.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l)) {
          val idx = valPtr(l) + (code - minCode(l))
          if (idx >= vals.length) return -1
          return vals(idx)
        }
        l += 1
      }
      -1
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * de-stuffing; stops (-1) at any marker or the segment end.
    */
  private final class BitReader(p: Array[Byte], var pos: Int, limit: Int) {
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= limit) return -1
        var b = u8(p, pos)
        pos += 1
        if (b == 0xFF) {
          if (pos >= limit) return -1
          val m = u8(p, pos)
          if (m == 0x00) pos += 1 // stuffed data byte
          else return -1 // a real marker: entropy data ended early
          b = 0xFF
        }
        cur = b
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    /** `n`-bit MSB-first field; -1 on starvation (n ≤ 16). */
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
  }

  /** Signed-magnitude EXTEND (T.81 F.2.2.1): an s-bit magnitude v decodes
    * to v if the top bit is set, else v - (2^s - 1).
    */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v >= (1 << (s - 1))) v else v - (1 << s) + 1

  def jpeg(p: Array[Byte]): InternalRow = {
    val out = new Array[Any](6)
    if (p.length < 4 || u8(p, 0) != 0xFF || u8(p, 1) != 0xD8)
      return new GenericInternalRow(out)
    var pos = 2
    var w = -1
    var h = -1
    var quant: Array[Int] = null
    var dcT: JHuff = null
    var acT: JHuff = null
    var sosAt = -1
    // Segment walk to SOS, bounded by position progress alone: every
    // iteration advances pos by 2+len with len >= 2 enforced below, so the
    // walk is O(p.length) and an APPn/COM-heavy file (EXIF/XMP) with any
    // number of metadata segments still reaches its SOS (a fixed hop cap
    // silently nulled such files out).
    while (sosAt < 0 && pos + 4 <= p.length) {
      if (u8(p, pos) != 0xFF) return new GenericInternalRow(out)
      val marker = u8(p, pos + 1)
      val len = beU16(p, pos + 2)
      if (len < 2 || pos + 2 + len > p.length) return new GenericInternalRow(out)
      val body = pos + 4
      marker match {
        case 0xDB => // DQT: only 8-bit table 0 in the grayscale envelope
          if (len >= 67 && (u8(p, body) & 0xF0) == 0) {
            quant = Array.tabulate(64)(i => u8(p, body + 1 + i))
          }
        case 0xC0 => // SOF0 baseline: 8-bit, exactly one 1x1 component
          if (len >= 11 && u8(p, body) == 8 && u8(p, body + 5) == 1 &&
            u8(p, body + 7) == 0x11) {
            h = beU16(p, body + 1)
            w = beU16(p, body + 3)
          } else return new GenericInternalRow(out) // outside the envelope
        case 0xC4 => // DHT: possibly several tables in one segment
          var q = body
          while (q + 17 <= pos + 2 + len) {
            val tc = u8(p, q) >> 4
            val th = u8(p, q) & 0x0F
            val bits = new Array[Int](17)
            var n = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(p, q + l); n += bits(l); l += 1 }
            if (q + 17 + n > pos + 2 + len || n > 256) return new GenericInternalRow(out)
            val vals = Array.tabulate(n)(i => u8(p, q + 17 + i))
            if (th == 0) {
              if (tc == 0) dcT = new JHuff(bits, vals)
              else if (tc == 1) acT = new JHuff(bits, vals)
            }
            q += 17 + n
          }
        case 0xDA => sosAt = pos // SOS: entropy data follows the header
        case 0xD9 => return new GenericInternalRow(out) // EOI before SOS
        case _ => () // APPn / COM / others: skip
      }
      if (sosAt < 0) pos += 2 + len
    }
    if (sosAt < 0 || w <= 0 || h <= 0 || quant == null || dcT == null ||
      acT == null || w > (1 << 14) || h > (1 << 14))
      return new GenericInternalRow(out)
    out(0) = Integer.valueOf(w)
    out(1) = Integer.valueOf(h)
    val sosLen = beU16(p, sosAt + 2)
    val scanStart = sosAt + 2 + sosLen
    if (scanStart >= p.length) return new GenericInternalRow(out)
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val r = new BitReader(p, scanStart, p.length)
    var sum = 0L
    var wsum = 0L
    var nAc = 0L
    var pred = 0
    val coef = new Array[Int](64)
    var by = 0
    var ok = true
    while (ok && by < bh) {
      var bx = 0
      while (ok && bx < bw) {
        java.util.Arrays.fill(coef, 0)
        // DC: category + extended difference, predicted from the last block
        val t = dcT.decode(r)
        if (t < 0 || t > 11) ok = false
        else {
          val diffBits = if (t == 0) 0 else r.bits(t)
          if (diffBits < 0) ok = false
          else {
            pred += extend(diffBits, t)
            coef(0) = pred * quant(0)
            // AC: run/size pairs until EOB or 63 coefficients
            var k = 1
            var eob = false
            while (ok && !eob && k < 64) {
              val rs = acT.decode(r)
              if (rs < 0) ok = false
              else if (rs == 0x00) eob = true
              else if (rs == 0xF0) k += 16 // ZRL
              else {
                val run = rs >> 4
                val size = rs & 0x0F
                k += run
                if (k > 63) ok = false
                else {
                  val m = r.bits(size)
                  if (m < 0) ok = false
                  else {
                    coef(k) = extend(m, size) * quant(k)
                    nAc += 1
                    k += 1
                  }
                }
              }
            }
            if (ok) {
              // reconstruct + fold the in-geometry pixels of this block
              var hasAc = false
              var i = 1
              while (i < 64 && !hasAc) { hasAc = coef(i) != 0; i += 1 }
              var yy = 0
              while (yy < 8) {
                val py = by * 8 + yy
                if (py < h) {
                  var xx = 0
                  while (xx < 8) {
                    val px = bx * 8 + xx
                    if (px < w) {
                      val v =
                        if (!hasAc) {
                          // flat block: IDCT is exactly DC/8 (T.81 A.3.3)
                          val f = coef(0)
                          val q8 = if (f >= 0) (f + 4) / 8 else -((-f + 4) / 8)
                          math.min(255, math.max(0, q8 + 128))
                        } else idctPixel(coef, xx, yy)
                      sum += v
                      wsum += (py.toLong * w + px + 1L) * v
                    }
                    xx += 1
                  }
                }
                yy += 1
              }
            }
          }
        }
        bx += 1
      }
      by += 1
    }
    out(2) = java.lang.Long.valueOf(bw.toLong * bh)
    if (ok) {
      out(3) = java.lang.Long.valueOf(sum)
      out(4) = java.lang.Long.valueOf(wsum)
      out(5) = java.lang.Long.valueOf(nAc)
    }
    new GenericInternalRow(out)
  }

  /** Grid-mean content embedding over the baseline GRAYSCALE envelope
    * (round-14, the [[graft.functions.MediaDecode.embed]] JPEG tier): the
    * same segment walk + entropy decode + reconstruction as [[jpeg]], but
    * folding per-pixel values into a 4×4 spatial grid instead of global
    * sums, emitted as 48 dims (each cell's mean duplicated across the
    * R,G,B slots so image embeddings share one space regardless of
    * source format; values in [0,1]). Error contract is simpler than the
    * stats row's: ANY failure — bad gates, malformed entropy stream,
    * progressive/color file — returns null (the encoder's honest-null
    * routing). w,h < 4 also null (a grid cell would be empty).
    */
  def embedGray(p: Array[Byte]): Array[Double] = {
    if (p.length < 4 || u8(p, 0) != 0xFF || u8(p, 1) != 0xD8) return null
    var pos = 2
    var w = -1
    var h = -1
    var quant: Array[Int] = null
    var dcT: JHuff = null
    var acT: JHuff = null
    var sosAt = -1
    while (sosAt < 0 && pos + 4 <= p.length) {
      if (u8(p, pos) != 0xFF) return null
      val marker = u8(p, pos + 1)
      val len = beU16(p, pos + 2)
      if (len < 2 || pos + 2 + len > p.length) return null
      val body = pos + 4
      marker match {
        case 0xDB =>
          if (len >= 67 && (u8(p, body) & 0xF0) == 0)
            quant = Array.tabulate(64)(i => u8(p, body + 1 + i))
        case 0xC0 =>
          if (len >= 11 && u8(p, body) == 8 && u8(p, body + 5) == 1 &&
            u8(p, body + 7) == 0x11) {
            h = beU16(p, body + 1)
            w = beU16(p, body + 3)
          } else return null
        case 0xC4 =>
          var q = body
          while (q + 17 <= pos + 2 + len) {
            val tc = u8(p, q) >> 4
            val th = u8(p, q) & 0x0F
            val bits = new Array[Int](17)
            var n = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(p, q + l); n += bits(l); l += 1 }
            if (q + 17 + n > pos + 2 + len || n > 256) return null
            val vals = Array.tabulate(n)(i => u8(p, q + 17 + i))
            if (th == 0) {
              if (tc == 0) dcT = new JHuff(bits, vals)
              else if (tc == 1) acT = new JHuff(bits, vals)
            }
            q += 17 + n
          }
        case 0xDA => sosAt = pos
        case 0xD9 => return null
        case _ => ()
      }
      if (sosAt < 0) pos += 2 + len
    }
    if (sosAt < 0 || w < 4 || h < 4 || quant == null || dcT == null ||
      acT == null || w > (1 << 14) || h > (1 << 14)) return null
    val sosLen = beU16(p, sosAt + 2)
    val scanStart = sosAt + 2 + sosLen
    if (scanStart >= p.length) return null
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val r = new BitReader(p, scanStart, p.length)
    val sums = new Array[Long](16)
    val cnts = new Array[Long](16)
    var pred = 0
    val coef = new Array[Int](64)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        java.util.Arrays.fill(coef, 0)
        val t = dcT.decode(r)
        if (t < 0 || t > 11) return null
        val diffBits = if (t == 0) 0 else r.bits(t)
        if (diffBits < 0) return null
        pred += extend(diffBits, t)
        coef(0) = pred * quant(0)
        var k = 1
        var eob = false
        while (!eob && k < 64) {
          val rs = acT.decode(r)
          if (rs < 0) return null
          else if (rs == 0x00) eob = true
          else if (rs == 0xF0) k += 16
          else {
            val run = rs >> 4
            val size = rs & 0x0F
            k += run
            if (k > 63) return null
            val m = r.bits(size)
            if (m < 0) return null
            coef(k) = extend(m, size) * quant(k)
            k += 1
          }
        }
        var hasAc = false
        var i = 1
        while (i < 64 && !hasAc) { hasAc = coef(i) != 0; i += 1 }
        var yy = 0
        while (yy < 8) {
          val py = by * 8 + yy
          if (py < h) {
            var xx = 0
            while (xx < 8) {
              val px = bx * 8 + xx
              if (px < w) {
                val v =
                  if (!hasAc) {
                    val f = coef(0)
                    val q8 = if (f >= 0) (f + 4) / 8 else -((-f + 4) / 8)
                    math.min(255, math.max(0, q8 + 128))
                  } else idctPixel(coef, xx, yy)
                val cell = (py * 4 / h) * 4 + px * 4 / w
                sums(cell) += v
                cnts(cell) += 1
              }
              xx += 1
            }
          }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    val out = new Array[Double](48)
    var c = 0
    while (c < 16) {
      if (cnts(c) == 0) return null
      val m = (sums(c).toDouble / cnts(c)) / 255.0
      out(c * 3) = m; out(c * 3 + 1) = m; out(c * 3 + 2) = m
      c += 1
    }
    out
  }

  val colorOutType: StructType = StructType(Seq(
    StructField("w", IntegerType), StructField("h", IntegerType),
    StructField("n_mcus", LongType),
    StructField("sum_y", LongType), StructField("sum_cb", LongType),
    StructField("sum_cr", LongType),
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType), StructField("wsum_r", LongType),
    StructField("n_ac_coeffs", LongType)))

  /** COLOR baseline JPEG decode — the multi-component tier: YCbCr, either
    * three full-resolution components (4:4:4, every sampling factor 1×1)
    * or the dominant real-corpus layout 4:2:0 (Y sampled 2×2, chroma 1×1;
    * any other sampling nulls out). Runs the full T.81 machinery of
    * [[jpeg]] per component — per-table DQT/DHT bookkeeping (luma/chroma
    * quantizers and Huffman pairs), SOS component→table binding,
    * interleaved MCUs (four Y data units per MCU in the 4:2:0 case, T.81
    * A.2.3 ordering) with per-COMPONENT DC predictors, AC run-length
    * decode, dequant, reconstruction — then converts to RGB with
    * libjpeg's exact 16-bit fixed-point arithmetic (jdcolor.c:
    * FIX(1.40200) = 91881, FIX(0.34414) = 22554, FIX(0.71414) = 46802,
    * FIX(1.77200) = 116130, +32768 rounding, arithmetic >> 16), i.e. the
    * SAME integers ImageIO's native reader produces — which is what lets
    * MultimodalSpec pin byte parity on the color output too.
    *
    * Chroma upsampling in the 4:2:0 case is libjpeg's FANCY (h2v2
    * triangular) filter — jdsample.c's h2v2_fancy_upsample: per output
    * pixel the nearer chroma ROW weighs 3:1 against the farther within
    * each of the two nearest columns, the nearer COLUMN sum weighs 3:1
    * against the farther, with rounding 8 (even px) / 7 (odd px) and one
    * >> 4; image edges clamp the neighbor index (reproducing libjpeg's
    * first/last-sample special cases). These are the SAME integers
    * ImageIO's native reader produces — which is what lets the 4:2:0
    * fixtures vary chroma PER MCU (MediaSynth.jpegColor420 plants a
    * different (Cb, Cr) per 16×16 block) and still pin per-pixel ImageIO
    * parity in MultimodalSpec. T.81 does not mandate an upsampling filter;
    * matching libjpeg's default is the interoperable choice (sample
    * replication — the pre-r13 implementation — only agreed on flat-chroma
    * images). Null/integrity semantics follow [[jpeg]]: junk returns
    * all-null, a malformed entropy stream (in ANY component — chroma
    * corruption triggers exactly like luma) nulls the sums.
    */
  def jpegColor(p: Array[Byte]): InternalRow = {
    val out = new Array[Any](11)
    if (p.length < 4 || u8(p, 0) != 0xFF || u8(p, 1) != 0xD8)
      return new GenericInternalRow(out)
    var pos = 2
    var w = -1
    var h = -1
    var lumaSamp = 1 // 1 = 4:4:4, 2 = 4:2:0 (Y 2×2, chroma 1×1)
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[JHuff](4)
    val acTabs = new Array[JHuff](4)
    var compId: Array[Int] = null
    var compQ: Array[Int] = null
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var sosAt = -1
    while (sosAt < 0 && pos + 4 <= p.length) {
      if (u8(p, pos) != 0xFF) return new GenericInternalRow(out)
      val marker = u8(p, pos + 1)
      val len = beU16(p, pos + 2)
      if (len < 2 || pos + 2 + len > p.length) return new GenericInternalRow(out)
      val body = pos + 4
      val end = pos + 2 + len
      marker match {
        case 0xDB => // DQT: possibly several 8-bit tables per segment
          var q = body
          while (q + 65 <= end) {
            val pq = u8(p, q) >> 4
            val tq = u8(p, q) & 0x0F
            if (pq == 0 && tq < 4)
              quant(tq) = Array.tabulate(64)(i => u8(p, q + 1 + i))
            q += 65
          }
        case 0xC0 => // SOF0 baseline: 8-bit, three components, 4:4:4 or 4:2:0
          val samp444 = len >= 17 && u8(p, body) == 8 && u8(p, body + 5) == 3 &&
            (0 until 3).forall(c => u8(p, body + 7 + 3 * c) == 0x11)
          val samp420 = len >= 17 && u8(p, body) == 8 && u8(p, body + 5) == 3 &&
            u8(p, body + 7) == 0x22 && u8(p, body + 10) == 0x11 &&
            u8(p, body + 13) == 0x11
          if (samp444 || samp420) {
            if (samp420) lumaSamp = 2
            h = beU16(p, body + 1)
            w = beU16(p, body + 3)
            compId = Array.tabulate(3)(c => u8(p, body + 6 + 3 * c))
            compQ = Array.tabulate(3)(c => u8(p, body + 8 + 3 * c))
          } else return new GenericInternalRow(out) // outside the envelope
        case 0xC4 => // DHT: possibly several tables in one segment
          var q = body
          while (q + 17 <= end) {
            val tc = u8(p, q) >> 4
            val th = u8(p, q) & 0x0F
            val bits = new Array[Int](17)
            var n = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(p, q + l); n += bits(l); l += 1 }
            if (q + 17 + n > end || n > 256) return new GenericInternalRow(out)
            val vals = Array.tabulate(n)(i => u8(p, q + 17 + i))
            if (th < 4) {
              if (tc == 0) dcTabs(th) = new JHuff(bits, vals)
              else if (tc == 1) acTabs(th) = new JHuff(bits, vals)
            }
            q += 17 + n
          }
        case 0xDA => // SOS: bind each scan component to its tables
          if (len != 12 || u8(p, body) != 3 || compId == null)
            return new GenericInternalRow(out)
          var c = 0
          while (c < 3) {
            val cid = u8(p, body + 1 + 2 * c)
            val tt = u8(p, body + 2 + 2 * c)
            val idx = compId.indexOf(cid)
            if (idx < 0) return new GenericInternalRow(out)
            compDc(idx) = tt >> 4
            compAc(idx) = tt & 0x0F
            c += 1
          }
          sosAt = pos
        case 0xD9 => return new GenericInternalRow(out) // EOI before SOS
        case _ => () // APPn / COM / others: skip
      }
      if (sosAt < 0) pos += 2 + len
    }
    // the 4:2:0 path buffers full sample planes (fancy upsampling needs
    // cross-MCU chroma neighbors), so its dimension cap is tighter: 1.5
    // bytes/pixel ≤ 100 MB at 8192² — the same order as the BufferedImage
    // any real decoder materializes for such an image
    if (sosAt < 0 || w <= 0 || h <= 0 || compQ == null ||
      w > (1 << 14) || h > (1 << 14) ||
      (lumaSamp == 2 && (w > (1 << 13) || h > (1 << 13))) ||
      (0 until 3).exists(c => quant(compQ(c)) == null ||
        dcTabs(compDc(c)) == null || acTabs(compAc(c)) == null))
      return new GenericInternalRow(out)
    out(0) = Integer.valueOf(w)
    out(1) = Integer.valueOf(h)
    val scanStart = sosAt + 2 + beU16(p, sosAt + 2)
    if (scanStart >= p.length) return new GenericInternalRow(out)
    val mcuPx = 8 * lumaSamp // MCU pixel span: 8 (4:4:4) or 16 (4:2:0)
    val bw = (w + mcuPx - 1) / mcuPx
    val bh = (h + mcuPx - 1) / mcuPx
    val nLuma = lumaSamp * lumaSamp // Y data units per MCU (1 or 4)
    val r = new BitReader(p, scanStart, p.length)
    val sums = new Array[Long](3) // y, cb, cr
    var sumR = 0L
    var sumG = 0L
    var sumB = 0L
    var wsumR = 0L
    var nAc = 0L
    val pred = new Array[Int](3)
    // data units 0..nLuma-1 = Y (T.81 A.2.3: left-to-right, top-to-bottom),
    // then Cb, then Cr
    val coef = Array.ofDim[Int](nLuma + 2, 64)
    val hasAc = new Array[Boolean](nLuma + 2)
    def clamp255(v: Int): Int = math.min(255, math.max(0, v))
    // 4:2:0 plane buffers: the chroma plane varies across MCUs and the
    // upsampling filter reads NEIGHBOR samples across MCU boundaries, so
    // the pixel fold cannot run per-MCU — decode every sample into padded
    // planes first, fold after the scan
    val yW = if (lumaSamp == 2) 16 * bw else 0
    val cwPad = if (lumaSamp == 2) 8 * bw else 0
    val yPlane: Array[Byte] = if (lumaSamp == 2) new Array(yW * 16 * bh) else null
    val cbPlane: Array[Byte] = if (lumaSamp == 2) new Array(cwPad * 8 * bh) else null
    val crPlane: Array[Byte] = if (lumaSamp == 2) new Array(cwPad * 8 * bh) else null
    var by = 0
    var ok = true
    while (ok && by < bh) {
      var bx = 0
      while (ok && bx < bw) {
        // interleaved MCU: nLuma Y units then Cb, Cr — the DC predictor is
        // per COMPONENT, so all Y units in an MCU chain through pred(0)
        var unit = 0
        while (ok && unit < nLuma + 2) {
          val comp = if (unit < nLuma) 0 else unit - nLuma + 1
          val cz = coef(unit)
          java.util.Arrays.fill(cz, 0)
          val qt = quant(compQ(comp))
          val t = dcTabs(compDc(comp)).decode(r)
          if (t < 0 || t > 11) ok = false
          else {
            val diffBits = if (t == 0) 0 else r.bits(t)
            if (diffBits < 0) ok = false
            else {
              pred(comp) += extend(diffBits, t)
              cz(0) = pred(comp) * qt(0)
              var k = 1
              var eob = false
              val acT = acTabs(compAc(comp))
              while (ok && !eob && k < 64) {
                val rs = acT.decode(r)
                if (rs < 0) ok = false
                else if (rs == 0x00) eob = true
                else if (rs == 0xF0) k += 16 // ZRL
                else {
                  val run = rs >> 4
                  val size = rs & 0x0F
                  k += run
                  if (k > 63) ok = false
                  else {
                    val m = r.bits(size)
                    if (m < 0) ok = false
                    else {
                      cz(k) = extend(m, size) * qt(k)
                      nAc += 1
                      k += 1
                    }
                  }
                }
              }
              if (ok) {
                var has = false
                var i = 1
                while (i < 64 && !has) { has = cz(i) != 0; i += 1 }
                hasAc(unit) = has
              }
            }
          }
          unit += 1
        }
        if (ok) {
          def unitVal(unit: Int, xx: Int, yy: Int): Int =
            if (!hasAc(unit)) {
              val f = coef(unit)(0)
              val q8 = if (f >= 0) (f + 4) / 8 else -((-f + 4) / 8)
              clamp255(q8 + 128)
            } else idctPixel(coef(unit), xx, yy)
          if (lumaSamp == 2) {
            // 4:2:0: write decoded (range-limited) samples into the plane
            // buffers; the pixel fold runs after the scan because fancy
            // upsampling needs chroma neighbors from adjacent MCUs
            var u = 0
            while (u < nLuma) {
              val baseX = bx * 16 + (u & 1) * 8
              val baseY = by * 16 + (u >> 1) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  yPlane((baseY + yy) * yW + baseX + xx) =
                    unitVal(u, xx, yy).toByte
                  xx += 1
                }
                yy += 1
              }
              u += 1
            }
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val at = (by * 8 + yy) * cwPad + bx * 8 + xx
                cbPlane(at) = unitVal(nLuma, xx, yy).toByte
                crPlane(at) = unitVal(nLuma + 1, xx, yy).toByte
                xx += 1
              }
              yy += 1
            }
          } else {
            // 4:4:4: fold the in-geometry pixels streaming — every
            // component is full-resolution, no upsampling anywhere
            var yy = 0
            while (yy < mcuPx) {
              val py = by * mcuPx + yy
              if (py < h) {
                var xx = 0
                while (xx < mcuPx) {
                  val px = bx * mcuPx + xx
                  if (px < w) {
                    val yv = unitVal(0, xx, yy)
                    val cbv = unitVal(nLuma, xx, yy)
                    val crv = unitVal(nLuma + 1, xx, yy)
                    sums(0) += yv
                    sums(1) += cbv
                    sums(2) += crv
                    val cbx = cbv - 128
                    val crx = crv - 128
                    val rv = clamp255(yv + ((91881 * crx + 32768) >> 16))
                    val gv = clamp255(
                      yv + ((-22554 * cbx - 46802 * crx + 32768) >> 16))
                    val bv = clamp255(yv + ((116130 * cbx + 32768) >> 16))
                    sumR += rv
                    sumG += gv
                    sumB += bv
                    wsumR += (py.toLong * w + px + 1L) * rv
                  }
                  xx += 1
                }
              }
              yy += 1
            }
          }
        }
        bx += 1
      }
      by += 1
    }
    if (ok && lumaSamp == 2) {
      // Chroma upsampling = libjpeg's h2v2 "fancy" triangular filter
      // (jdsample.c h2v2_fancy_upsample — the filter ImageIO's native
      // reader runs by default, pinned byte-exact per pixel in
      // MultimodalSpec): vertically the NEARER chroma row gets weight 3
      // and the farther 1 (t = 3·s[j] + s[j±1]), horizontally the two
      // column sums combine 3:1 with rounding 8 (even px) / 7 (odd px)
      // and a >> 4. Image edges replicate (the clamped neighbor makes
      // t = 4·s, reproducing libjpeg's first/last special cases).
      val cdw = (w + 1) / 2
      val cdh = (h + 1) / 2
      var py = 0
      while (py < h) {
        val j = py >> 1
        val jn =
          if ((py & 1) == 0) { if (j > 0) j - 1 else 0 }
          else math.min(j + 1, cdh - 1)
        var px = 0
        while (px < w) {
          val i = px >> 1
          val in2 =
            if ((px & 1) == 0) { if (i > 0) i - 1 else 0 }
            else math.min(i + 1, cdw - 1)
          val rnd = if ((px & 1) == 0) 8 else 7
          val cbv = (3 * (3 * (cbPlane(j * cwPad + i) & 0xFF) +
            (cbPlane(jn * cwPad + i) & 0xFF)) +
            (3 * (cbPlane(j * cwPad + in2) & 0xFF) +
              (cbPlane(jn * cwPad + in2) & 0xFF)) + rnd) >> 4
          val crv = (3 * (3 * (crPlane(j * cwPad + i) & 0xFF) +
            (crPlane(jn * cwPad + i) & 0xFF)) +
            (3 * (crPlane(j * cwPad + in2) & 0xFF) +
              (crPlane(jn * cwPad + in2) & 0xFF)) + rnd) >> 4
          val yv = yPlane(py * yW + px) & 0xFF
          sums(0) += yv
          sums(1) += cbv
          sums(2) += crv
          val cbx = cbv - 128
          val crx = crv - 128
          val rv = clamp255(yv + ((91881 * crx + 32768) >> 16))
          val gv = clamp255(yv + ((-22554 * cbx - 46802 * crx + 32768) >> 16))
          val bv = clamp255(yv + ((116130 * cbx + 32768) >> 16))
          sumR += rv
          sumG += gv
          sumB += bv
          wsumR += (py.toLong * w + px + 1L) * rv
          px += 1
        }
        py += 1
      }
    }
    out(2) = java.lang.Long.valueOf(bw.toLong * bh)
    if (ok) {
      out(3) = java.lang.Long.valueOf(sums(0))
      out(4) = java.lang.Long.valueOf(sums(1))
      out(5) = java.lang.Long.valueOf(sums(2))
      out(6) = java.lang.Long.valueOf(sumR)
      out(7) = java.lang.Long.valueOf(sumG)
      out(8) = java.lang.Long.valueOf(sumB)
      out(9) = java.lang.Long.valueOf(wsumR)
      out(10) = java.lang.Long.valueOf(nAc)
    }
    new GenericInternalRow(out)
  }

  // zig-zag order: index in scan order -> (row, col)
  private val zzRow = Array(
    0, 0, 1, 2, 1, 0, 0, 1, 2, 3, 4, 3, 2, 1, 0, 0, 1, 2, 3, 4, 5, 6, 5, 4,
    3, 2, 1, 0, 0, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3, 2, 1, 2, 3, 4, 5, 6,
    7, 7, 6, 5, 4, 3, 4, 5, 6, 7, 7, 6, 5, 6, 7, 7)
  private val zzCol = Array(
    0, 1, 0, 0, 1, 2, 3, 2, 1, 0, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0, 0, 1, 2,
    3, 4, 5, 6, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3,
    2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 5, 6, 7, 7, 6, 7)

  /** Reference double-precision 2-D IDCT of one pixel (T.81 A.3.3) over
    * zig-zag-ordered dequantized coefficients; rounded and clamped. Exact
    * on DC-only blocks; on AC blocks this is the non-mandated tier where
    * conforming decoders may differ by ±1.
    */
  private def idctPixel(coefZz: Array[Int], x: Int, y: Int): Int = {
    var s = 0.0
    var k = 0
    while (k < 64) {
      val f = coefZz(k)
      if (f != 0) {
        val u = zzCol(k)
        val v = zzRow(k)
        val cu = if (u == 0) 0.7071067811865476 else 1.0
        val cv = if (v == 0) 0.7071067811865476 else 1.0
        s += cu * cv * f *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      }
      k += 1
    }
    val p = math.round(s / 4).toInt + 128
    math.min(255, math.max(0, p))
  }
}

case class JpegStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_stats expects a binary payload, got $other")
  }
  override def dataType: DataType = JpegDecode.outType
  override def nullSafeEval(p: Any): Any = JpegDecode.jpeg(p.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.JpegDecode.jpeg($c);")
  override protected def withNewChildInternal(newChild: Expression): JpegStats =
    copy(child = newChild)
  override def prettyName: String = "graft_jpeg_stats"
}

case class JpegColorStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_color_stats expects a binary payload, got $other")
  }
  override def dataType: DataType = JpegDecode.colorOutType
  override def nullSafeEval(p: Any): Any =
    JpegDecode.jpegColor(p.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.JpegDecode.jpegColor($c);")
  override protected def withNewChildInternal(newChild: Expression): JpegColorStats =
    copy(child = newChild)
  override def prettyName: String = "graft_jpeg_color_stats"
}

object JpegFunctions {
  val statsName = "graft_jpeg_stats"
  val colorStatsName = "graft_jpeg_color_stats"
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      statsName, exprs => JpegStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      colorStatsName, exprs => JpegColorStats(exprs.head), "built-in")
  }
  def jpegStats(payload: Column): Column = call_function(statsName, payload)
  def jpegColorStats(payload: Column): Column = call_function(colorStatsName, payload)
}
