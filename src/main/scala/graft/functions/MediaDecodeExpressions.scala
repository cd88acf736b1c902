package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native codegen kernels for the three media decode folds (PNG stored-
  * deflate pixels, 24-bit BMP pixels, PCM16 WAV samples). Each is the
  * bit-identical compiled twin of the expression-fold decoder it replaces
  * in [[graft.multimodal.Multimodal]]: the expression form documented the
  * byte-layout walk declaratively, but its `aggregate` lambda re-evaluates
  * an interpreted struct expression per payload byte — the dominant cost
  * of the whole multimodal family at bench scale (q_mm_png_pixels 3.3 s of
  * per-byte `conv(substr(hex))` at sf0.1). One compiled pass per row is the
  * plan a 100 TB decode actually wants: same zero-shuffle shape (scan →
  * byte-proportional repartition → projection), ~100× less per-byte work.
  *
  * Same native-kernel pattern as [[Winnow]] / [[VecDot]] / [[LangIdHits]]:
  * a `UnaryExpression` whose `doGenCode` emits one static call, so the
  * projection stays inside whole-stage codegen.
  *
  * Null/integrity semantics mirror the expression decoders exactly —
  * MultimodalSpec drives the corrupted-payload cases:
  *  - format gate fails (bad magic/planes/bit-depth/compression) → the
  *    geometry and all folded fields are null;
  *  - PNG: `ihdr_crc_ok` is computed independently of the gates (a header
  *    flip must fire it even though the rest still decodes), `adler_ok` is
  *    `false` when the zlib/stored framing is wrong, null when the stream
  *    was never reachable, and the trailer comparison otherwise;
  *  - a stored-block region that over-runs the payload (e.g. a corrupted
  *    width inflating the expected scanline bytes) yields null sums, as
  *    the expression fold's out-of-range reads did.
  */
object MediaDecode {

  // ---- shared little/big-endian readers over the raw payload -------------
  private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xFF
  private def leU16(p: Array[Byte], i: Int): Int = u8(p, i) | (u8(p, i + 1) << 8)
  private def leU32(p: Array[Byte], i: Int): Long =
    (u8(p, i) | (u8(p, i + 1) << 8) | (u8(p, i + 2) << 16)).toLong |
      (u8(p, i + 3).toLong << 24)
  private def beU32(p: Array[Byte], i: Int): Long =
    (u8(p, i).toLong << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) |
      u8(p, i + 3)
  private def ascii(p: Array[Byte], i: Int, s: String): Boolean = {
    if (i < 0 || i + s.length > p.length) return false
    var k = 0
    while (k < s.length) {
      if (p(i + k) != s.charAt(k).toByte) return false
      k += 1
    }
    true
  }

  // ---- PNG ---------------------------------------------------------------

  val pngType: StructType = StructType(Seq(
    StructField("w", IntegerType), StructField("h", IntegerType),
    StructField("ihdr_crc_ok", BooleanType), StructField("adler_ok", BooleanType),
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType), StructField("wsum_r", LongType),
    StructField("filter_violations", LongType)))

  private val pngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Full stored-deflate PNG decode: signature, IHDR gate + CRC32, bounded
    * chunk walk to the first IDAT, zlib CMF/FLG + stored-block framing
    * checks, then one pass over the raw scanlines folding channel sums,
    * the position-weighted checksum, filter-byte violations, and adler32.
    */
  def png(p: Array[Byte]): InternalRow = {
    val out = new Array[Any](9)
    val sigOk = p.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(p, 8), pngSig)
    val ihdrOk = sigOk && p.length >= 33 && beU32(p, 8) == 13 &&
      ascii(p, 12, "IHDR") &&
      u8(p, 24) == 8 && u8(p, 25) == 2 && // 8-bit truecolor
      u8(p, 26) == 0 && u8(p, 27) == 0 && u8(p, 28) == 0
    if (p.length >= 33) {
      val crc = new java.util.zip.CRC32()
      crc.update(p, 12, 17)
      out(2) = java.lang.Boolean.valueOf(beU32(p, 29) == crc.getValue)
    }
    if (!ihdrOk) return new GenericInternalRow(out)
    val w = beU32(p, 16).toInt
    val h = beU32(p, 20).toInt
    out(0) = Integer.valueOf(w)
    out(1) = Integer.valueOf(h)
    // bounded chunk walk (8 hops, as the expression walk): 0-based chunk
    // start; length field at pos, type at pos+4. A hostile declared length
    // may overflow the position — keep it in Long and stop on any escape
    // from the payload (the expression walk's out-of-range reads nulled).
    var pos = 33L
    var found = false
    var hop = 0
    while (hop < 8 && !found && pos >= 0 && pos + 8 <= p.length) {
      if (ascii(p, pos.toInt + 4, "IDAT")) found = true
      else pos += beU32(p, pos.toInt) + 12L
      hop += 1
    }
    if (!found || pos < 0 || pos + 8 > p.length)
      return new GenericInternalRow(out) // adler/sums stay null
    // hostile header dims wrap the expression version's INT cast too; any
    // non-positive geometry means the raw region is unreadable → null sums
    val rowBytes = w.toLong * 3 + 1
    val rawLen = h.toLong * rowBytes
    val z = pos.toInt + 8 // zlib CMF byte (skip IDAT length + type)
    val zlibOk = z + 7 <= p.length &&
      u8(p, z) == 0x78 && (u8(p, z) * 256 + u8(p, z + 1)) % 31 == 0 &&
      u8(p, z + 2) == 0x01 && // BFINAL=1, BTYPE=00 (stored)
      leU16(p, z + 3) == rawLen && leU16(p, z + 5) == 65535 - rawLen
    val rawOff = z + 7
    // rawLen <= 0 also catches Long overflow of h*rowBytes: the max hostile
    // product 2^31*(3*2^31+1) < 2^64, so any wrapped value is negative —
    // without this, a negative rawLen slips past both range checks below
    // and rawLen.toInt drives an out-of-bounds scanline read.
    if (w <= 0 || h <= 0 || rawLen <= 0 || rawOff + rawLen + 4 > p.length || rawLen > Int.MaxValue) {
      // region over-runs the payload: the expression fold's reads came back
      // null here — sums stay null; framing verdict still reported
      if (!zlibOk) out(3) = java.lang.Boolean.FALSE
      return new GenericInternalRow(out)
    }
    var sr = 0L; var sg = 0L; var sb = 0L; var wr = 0L; var viol = 0L
    var a = 1L; var b = 0L
    var i = 0
    val n = rawLen.toInt
    while (i < n) {
      val v = u8(p, rawOff + i)
      a += v; if (a >= 65521L) a -= 65521L
      b += a; if (b >= 65521L) b -= 65521L
      val j = i % rowBytes
      if (j > 0) {
        val chan = (j - 1) % 3
        if (chan == 0) {
          sr += v
          val ppos = (i / rowBytes).toLong * w + (j - 1) / 3
          wr += (ppos + 1L) * v
        } else if (chan == 1) sg += v
        else sb += v
      } else if (v != 0) viol += 1
      i += 1
    }
    out(3) = java.lang.Boolean.valueOf(
      zlibOk && beU32(p, rawOff + n) == b * 65536L + a)
    out(4) = java.lang.Long.valueOf(sr)
    out(5) = java.lang.Long.valueOf(sg)
    out(6) = java.lang.Long.valueOf(sb)
    out(7) = java.lang.Long.valueOf(wr)
    out(8) = java.lang.Long.valueOf(viol)
    new GenericInternalRow(out)
  }

  // ---- BMP ---------------------------------------------------------------

  val bmpType: StructType = StructType(Seq(
    StructField("w", IntegerType), StructField("h", IntegerType),
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType), StructField("wsum_r", LongType)))

  /** Uncompressed 24-bit BMP pixel fold: header gate (BM, 1 plane, 24 bpp,
    * BI_RGB), then the format's real memory layout — bottom-up rows, BGR
    * byte order, 4-byte row stride.
    */
  def bmp(p: Array[Byte]): InternalRow = {
    val out = new Array[Any](6)
    val ok = p.length >= 34 && p(0) == 'B'.toByte && p(1) == 'M'.toByte &&
      leU16(p, 26) == 1 && leU16(p, 28) == 24 && leU32(p, 30) == 0
    if (!ok) return new GenericInternalRow(out)
    val off = leU32(p, 10).toInt
    val w = leU32(p, 18).toInt
    val h = leU32(p, 22).toInt
    out(0) = Integer.valueOf(w)
    out(1) = Integer.valueOf(h)
    // stride in Long: a hostile width wraps the Int product; any negative
    // or out-of-payload geometry → null sums (the expression fold's
    // out-of-range reads nulled, never threw)
    val stride = (w.toLong * 3 + 3) & ~3L
    if (off < 0 || w <= 0 || h <= 0 ||
      off.toLong + stride * h > p.length || stride > Int.MaxValue)
      return new GenericInternalRow(out)
    val strideI = stride.toInt // fits: guarded above
    var sr = 0L; var sg = 0L; var sb = 0L; var wr = 0L
    var y = 0
    var i = 0L // image-order pixel index (top-down), drives the weighted sum
    while (y < h) {
      var base = off + (h - 1 - y) * strideI
      var x = 0
      while (x < w) {
        val bC = u8(p, base)
        val gC = u8(p, base + 1)
        val rC = u8(p, base + 2)
        sb += bC; sg += gC; sr += rC
        wr += (i + 1L) * rC
        i += 1; x += 1; base += 3
      }
      y += 1
    }
    out(2) = java.lang.Long.valueOf(sr)
    out(3) = java.lang.Long.valueOf(sg)
    out(4) = java.lang.Long.valueOf(sb)
    out(5) = java.lang.Long.valueOf(wr)
    new GenericInternalRow(out)
  }

  // ---- WAV ---------------------------------------------------------------

  val wavType: StructType = StructType(Seq(
    StructField("channels", IntegerType), StructField("sample_rate", LongType),
    StructField("n_samples", LongType), StructField("peak", LongType),
    StructField("sum_sq", LongType), StructField("zero_crossings", LongType),
    StructField("sum_s", LongType)))

  /** PCM16 WAV sample fold: fmt-chunk gate (PCM tag, 16-bit), data-chunk
    * length from the header (never the payload size), little-endian signed
    * sample decode, and the audio features in one pass (peak, energy,
    * zero-crossing count, amplitude sum).
    */
  def wav(p: Array[Byte]): InternalRow = {
    val out = new Array[Any](7)
    val ok = p.length >= 44 && ascii(p, 0, "RIFF") && ascii(p, 8, "WAVE") &&
      ascii(p, 12, "fmt ") && leU16(p, 20) == 1 && leU16(p, 34) == 16 &&
      ascii(p, 36, "data")
    if (!ok) return new GenericInternalRow(out)
    out(0) = Integer.valueOf(leU16(p, 22))
    out(1) = java.lang.Long.valueOf(leU32(p, 24))
    val n = (leU32(p, 40) >>> 1).toInt
    if (44 + n.toLong * 2 > p.length) return new GenericInternalRow(out)
    var peak = 0L; var sumSq = 0L; var zc = 0L; var sum = 0L
    var prevNeg = false
    var i = 0
    while (i < n) {
      val v = (u8(p, 44 + 2 * i) | (p(45 + 2 * i).toInt << 8)).toLong // s16le
      val av = if (v < 0) -v else v
      if (av > peak) peak = av
      sumSq += v * v
      sum += v
      val neg = v < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      i += 1
    }
    out(2) = java.lang.Long.valueOf(n.toLong)
    out(3) = java.lang.Long.valueOf(peak)
    out(4) = java.lang.Long.valueOf(sumSq)
    out(5) = java.lang.Long.valueOf(zc)
    out(6) = java.lang.Long.valueOf(sum)
    new GenericInternalRow(out)
  }
}

private[functions] abstract class MediaDecodeExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary payload, got $other")
  }
}

case class PngStats(child: Expression) extends MediaDecodeExpression {
  override def dataType: DataType = MediaDecode.pngType
  override def nullSafeEval(p: Any): Any = MediaDecode.png(p.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaDecode.png($c);")
  override protected def withNewChildInternal(newChild: Expression): PngStats =
    copy(child = newChild)
  override def prettyName: String = "graft_png_stats"
}

case class BmpStats(child: Expression) extends MediaDecodeExpression {
  override def dataType: DataType = MediaDecode.bmpType
  override def nullSafeEval(p: Any): Any = MediaDecode.bmp(p.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaDecode.bmp($c);")
  override protected def withNewChildInternal(newChild: Expression): BmpStats =
    copy(child = newChild)
  override def prettyName: String = "graft_bmp_stats"
}

case class WavStats(child: Expression) extends MediaDecodeExpression {
  override def dataType: DataType = MediaDecode.wavType
  override def nullSafeEval(p: Any): Any = MediaDecode.wav(p.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MediaDecode.wav($c);")
  override protected def withNewChildInternal(newChild: Expression): WavStats =
    copy(child = newChild)
  override def prettyName: String = "graft_wav_stats"
}

/** Session registration, same contract as [[VectorFunctions]]. */
object MediaDecodeFunctions {

  val pngName = "graft_png_stats"
  val bmpName = "graft_bmp_stats"
  val wavName = "graft_wav_stats"

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(pngName, exprs => PngStats(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(bmpName, exprs => BmpStats(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(wavName, exprs => WavStats(exprs.head), "built-in")
  }

  def pngStats(payload: Column): Column = call_function(pngName, payload)
  def bmpStats(payload: Column): Column = call_function(bmpName, payload)
  def wavStats(payload: Column): Column = call_function(wavName, payload)
}
