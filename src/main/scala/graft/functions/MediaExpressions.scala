package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** JPEG SOF dimension parser — a REAL marker-segment walker (unlike the
  * PNG/WAV fixed-offset parsers, JPEG's frame header sits behind a
  * variable-length segment list: APPn/COM/DQT/... each carry a big-endian
  * u16 length that must be followed; a pattern scan for FFC0 is wrong the
  * moment an APP payload contains those two bytes, which EXIF thumbnails
  * routinely do). Walks SOI → segments, skips standalone markers
  * (TEM/RSTn/spurious SOI), stops at a structural violation, truncation,
  * EOI, or SOS (the frame header must precede entropy data), and returns
  * struct(width, height) from the first SOFn (C0–CF minus the
  * non-frame C4/C8/CC).
  *
  * CodegenFallback: runs once per blob on a few header bytes — the eval
  * boundary is noise next to the scan that read the blob.
  */
case class JpegSofDims(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary payload, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      return null
    var pos = 2
    while (pos + 3 < b.length) {
      if ((b(pos) & 0xFF) != 0xFF) return null // lost sync: not a marker
      // optional fill bytes: a marker may be preceded by extra 0xFFs
      while (pos + 2 < b.length && (b(pos + 1) & 0xFF) == 0xFF) pos += 1
      // the fill run may have consumed the outer guard's headroom (e.g.
      // FF D8 FF FF FF E0): the default branch below reads pos+2/pos+3
      if (pos + 3 >= b.length) return null // truncated at a marker
      (b(pos + 1) & 0xFF) match {
        case 0xD8 | 0x01 => pos += 2                  // spurious SOI / TEM
        case m if m >= 0xD0 && m <= 0xD7 => pos += 2  // RSTn: standalone
        case 0xD9 => return null                      // EOI before any SOF
        case 0xDA => return null                      // SOS: SOF must precede
        case m if m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          // SOFn: len(2) precision(1) height(2) width(2) ...
          // Long compare: pos + 8 can wrap Int near a 2 GB blob tail
          if (pos.toLong + 8 >= b.length) return null
          val h = ((b(pos + 5) & 0xFF) << 8) | (b(pos + 6) & 0xFF)
          val w = ((b(pos + 7) & 0xFF) << 8) | (b(pos + 8) & 0xFF)
          return new GenericInternalRow(Array[Any](w, h))
        case _ =>
          val len = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
          // Long compare: pos + 2 + len can wrap Int near a 2 GB blob,
          // turning a truncation into an ArrayIndexOutOfBounds throw
          if (len < 2 || pos.toLong + 2 + len > b.length) return null
          pos += 2 + len
      }
    }
    null
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "jpeg_sof_dims"
}

/** TIFF dimensions via a real IFD walk — the header family's only
  * DUAL-ENDIAN format: byte order from the II/MM magic, the 42 check,
  * then the first IFD's 12-byte entries scanned for ImageWidth (256) /
  * ImageLength (257), honoring the left-justified inline value rule
  * (SHORT type 3 reads a u16, LONG type 4 a u32, both in the file's
  * byte order). Returns struct(width, height, bigendian) or null on
  * corrupt magic / truncation / missing tags. Tag values beyond these
  * two are skipped, so real-world IFDs with extra entries parse fine.
  * CodegenFallback: per-row cost is a bounded byte walk (≤ entries·12),
  * dominated by the struct allocation, not the eval boundary.
  *
  * Reference behavior modeled: the reference treats media as opaque
  * blobs (lambda stores bytes untouched); header mining is the
  * scan-side metadata layer built on top (SURVEY §2.11 multimodal). */
case class TiffDims(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("bigendian", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary payload, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 8) return null
    val le =
      if ((b(0) & 0xFF) == 0x49 && (b(1) & 0xFF) == 0x49) true
      else if ((b(0) & 0xFF) == 0x4D && (b(1) & 0xFF) == 0x4D) false
      else return null
    def u16(p: Int): Int =
      if (le) (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
      else ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
    def u32(p: Int): Long =
      if (le) (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
        ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
      else ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
        ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)
    if (u16(2) != 42) return null
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val p0 = ifd.toInt
    val n = u16(p0)
    // Long compare: p0 + 12n can wrap Int when the IFD sits at the tail
    // of a ~2 GB blob (the WebP r11 ADVICE class, fixed family-wide)
    if (p0.toLong + 2 + 12L * n > b.length) return null
    var width = -1L
    var height = -1L
    var i = 0
    while (i < n) {
      val e = p0 + 2 + 12 * i
      val tag = u16(e)
      if (tag == 256 || tag == 257) {
        val typ = u16(e + 2)
        val count = u32(e + 4)
        // inline values only (count 1, SHORT/LONG); anything else is not
        // a plain dimension — treat as corrupt rather than guessing
        if (count != 1L || (typ != 3 && typ != 4)) return null
        val v = if (typ == 3) u16(e + 8).toLong else u32(e + 8)
        if (tag == 256) width = v else height = v
      }
      i += 1
    }
    if (width < 0 || height < 0) return null
    new GenericInternalRow(Array[Any](width, height, if (le) 0L else 1L))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "tiff_dims"
}

/** PNG IHDR mining via a real chunk walk — the header family's only
  * CHUNKED format: the 8-byte signature (\x89PNG\r\n\x1a\n), then
  * length-prefixed chunks (u32 BE length, 4-byte type, payload, CRC)
  * walked until IHDR is found (spec says IHDR is first, but the walker
  * tolerates preceding ancillary chunks the way lenient real-world
  * readers do) or IEND/truncation ends the scan. IHDR yields
  * struct(width, height, bit_depth, color_type, interlace) — width and
  * height u32 BE, the other three single bytes. Null on corrupt
  * signature, truncated chunk, or a stream with no IHDR. CRCs are not
  * verified (metadata mining, not integrity checking — the lake's
  * checksum layer owns that). CodegenFallback: per-row cost is a
  * bounded chunk walk dominated by the struct allocation.
  *
  * Reference behavior modeled: the reference treats media as opaque
  * blobs (lambda stores bytes untouched); header mining is the
  * scan-side metadata layer built on top (SURVEY §2.11 multimodal). */
case class PngDims(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("bit_depth", LongType, nullable = false),
    StructField("color_type", LongType, nullable = false),
    StructField("interlace", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary payload, got $other")
  }

  private val Sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 8) return null
    var i = 0
    while (i < 8) {
      if ((b(i) & 0xFF) != Sig(i)) return null
      i += 1
    }
    def u32(p: Int): Long =
      ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
        ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)
    var p = 8
    while (p + 8 <= b.length) {
      val len = u32(p)
      val isIhdr = b(p + 4) == 'I' && b(p + 5) == 'H' &&
        b(p + 6) == 'D' && b(p + 7) == 'R'
      val isIend = b(p + 4) == 'I' && b(p + 5) == 'E' &&
        b(p + 6) == 'N' && b(p + 7) == 'D'
      if (isIhdr) {
        if (len < 13L || p + 8 + 13 > b.length) return null
        val d = p + 8
        return new GenericInternalRow(Array[Any](
          u32(d), u32(d + 4), (b(d + 8) & 0xFF).toLong,
          (b(d + 9) & 0xFF).toLong, (b(d + 12) & 0xFF).toLong))
      }
      if (isIend) return null
      // skip payload + CRC in Long: a length that fits the buffer can
      // still wrap the Int advance at the 2 GB boundary (WebP r11 class)
      val next = p.toLong + 8L + len + 4L
      if (next > b.length.toLong) return null
      p = next.toInt
    }
    null
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "png_dims"
}

/** ZIP archive summary — a REAL End-Of-Central-Directory walker: the
  * EOCD record is found by scanning BACKWARD from the file tail (its
  * trailing variable-length comment means it has no fixed offset — the
  * quirk every real unzipper must handle), then the central directory
  * it points at is walked entry by entry, each record advancing by
  * 46 + nameLen + extraLen + commentLen. Returns
  * struct(n_entries, comp_bytes, first_name); NULL on a missing/
  * corrupt EOCD signature, a bad entry signature, or any walk past the
  * buffer.
  *
  * CodegenFallback: one eval per blob over tail+directory bytes, same
  * adjudication as the other container parsers.
  */
case class ZipInfo(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_entries", LongType, nullable = false),
    StructField("comp_bytes", LongType, nullable = false),
    StructField("first_name", org.apache.spark.sql.types.StringType,
      nullable = true)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary payload, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 22) return null
    def u16(p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
    def u32(p: Int): Long = (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
    // backward scan for EOCD sig 50 4B 05 06 (comment ≤ 65535 bytes)
    var p = b.length - 22
    val floor = math.max(0, b.length - 22 - 65535)
    while (p >= floor && !(b(p) == 0x50 && b(p + 1) == 0x4B &&
        b(p + 2) == 0x05 && b(p + 3) == 0x06)) p -= 1
    if (p < floor) return null
    val total = u16(p + 10)
    val cdOff = u32(p + 16)
    if (cdOff < 0 || cdOff > b.length) return null
    var q = cdOff.toInt
    var comp = 0L
    var firstName: org.apache.spark.unsafe.types.UTF8String = null
    var e = 0
    while (e < total) {
      // Long compares throughout: q + 46(+lens) can wrap Int near a
      // ~2 GB blob tail (WebP r11 ADVICE class, fixed family-wide)
      if (q.toLong + 46 > b.length) return null
      if (!(b(q) == 0x50 && b(q + 1) == 0x4B &&
          b(q + 2) == 0x01 && b(q + 3) == 0x02)) return null
      val nameLen = u16(q + 28)
      val extraLen = u16(q + 30)
      val cmtLen = u16(q + 32)
      if (q.toLong + 46 + nameLen > b.length) return null
      if (e == 0) firstName = org.apache.spark.unsafe.types.UTF8String
        .fromBytes(b, q + 46, nameLen)
      comp += u32(q + 20)
      val nq = q.toLong + 46 + nameLen + extraLen + cmtLen
      if (nq > b.length.toLong) return null
      q = nq.toInt
      e += 1
    }
    new GenericInternalRow(Array[Any](total.toLong, comp, firstName))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "zip_info"
}

/** MP3 stream summary — a REAL frame walker with the two quirks every
  * mp3 parser must get right: an optional leading ID3v2 tag whose size
  * is SYNCSAFE-encoded (7 bits per byte — treating it as a plain u32
  * lands mid-tag and desyncs), and per-frame lengths computed from the
  * header's bitrate/samplerate table indices plus the padding bit —
  * frames are NOT fixed-size, so the walk must recompute the stride at
  * every header. Walks MPEG-1 Layer III frames from the first sync,
  * returns struct(n_frames, bitrate_kbps, sample_rate, duration_ms)
  * taken from the first frame's header (CBR contract), duration =
  * n_frames·1152·1000/sample_rate in integer math. NULL when the sync
  * is absent/corrupt, an index is reserved, or a frame runs past the
  * buffer.
  *
  * CodegenFallback: one eval per blob over header bytes, same
  * adjudication as the other container parsers. */
case class Mp3Info(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("bitrate_kbps", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary payload, got $other")
  }

  private val Bitrates = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, -1)
  private val Samplerates = Array(44100, 48000, 32000, -1)

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var p = 0
    // ID3v2: "ID3" ver(2) flags(1) size(4, syncsafe 7-bit bytes)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      p = 10 + size
    }
    var n = 0L
    var kbps = -1L
    var sr = -1L
    while (p + 4 <= b.length) {
      if ((b(p) & 0xFF) != 0xFF || (b(p + 1) & 0xE0) != 0xE0) {
        if (n == 0) return null else return row(n, kbps, sr)
      }
      val version = (b(p + 1) >> 3) & 3
      val layer = (b(p + 1) >> 1) & 3
      if (version != 3 || layer != 1) return null // MPEG-1 Layer III only
      val bidx = (b(p + 2) >> 4) & 0xF
      val sidx = (b(p + 2) >> 2) & 3
      val pad = (b(p + 2) >> 1) & 1
      val rate = Bitrates(bidx)
      val hz = Samplerates(sidx)
      if (rate < 0 || hz < 0) return null
      if (n == 0) { kbps = rate.toLong; sr = hz.toLong }
      else if (kbps != rate || sr != hz) return null // CBR contract
      val frameLen = 144 * rate * 1000 / hz + pad
      // Long compare: p + frameLen can wrap Int at the 2 GB boundary
      if (frameLen <= 4 || p.toLong + frameLen > b.length) return null
      p += frameLen
      n += 1
    }
    if (n == 0) null else row(n, kbps, sr)
  }

  private def row(n: Long, kbps: Long, sr: Long): GenericInternalRow =
    new GenericInternalRow(Array[Any](n, kbps, sr, n * 1152L * 1000L / sr))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "mp3_info"
}

/** WEBP dimensions — a REAL RIFF chunk walker: validates the
  * `RIFF....WEBP` container, then walks chunks (fourcc + u32 LE size,
  * payloads padded to EVEN offsets — the RIFF quirk a fixed-offset
  * reader gets wrong the moment an EXIF/ICCP chunk precedes the image
  * data) until it finds the bitstream:
  *
  *  - `VP8 ` (lossy): 3-byte frame tag, the 9D 01 2A sync code, then
  *    width/height as u16 LE with the low 14 bits significant;
  *  - `VP8L` (lossless): the 0x2F signature byte, then a packed LE
  *    u32 holding width−1 (bits 0–13) and height−1 (bits 14–27).
  *
  * Returns struct(format 'lossy'|'lossless', width, height); NULL on a
  * corrupt container signature, unknown-only chunks, a bad sync or
  * VP8L signature, or any walk past the buffer. CodegenFallback: one
  * bounded header walk per blob, same adjudication as the other
  * container parsers.
  */
case class WebpDims(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", org.apache.spark.sql.types.StringType,
      nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary payload, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 12) return null
    def fourcc(p: Int, s: String): Boolean =
      b(p) == s.charAt(0).toByte && b(p + 1) == s.charAt(1).toByte &&
        b(p + 2) == s.charAt(2).toByte && b(p + 3) == s.charAt(3).toByte
    def u32le(p: Int): Long =
      (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
        ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
    def u16le(p: Int): Long = (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8)
    if (!fourcc(0, "RIFF") || !fourcc(8, "WEBP")) return null
    var p = 12
    while (p + 8 <= b.length) {
      val size = u32le(p + 4)
      // Bound against REMAINING bytes (not total length): guarantees
      // p + 8 + size + pad <= b.length + 1, so the Int advance below can
      // never overflow even for blobs near 2 GB — the expression's
      // contract is NULL on any junk, never a throw.
      if (size > (b.length - p - 8).toLong) return null
      if (fourcc(p, "VP8 ")) {
        val d = p + 8
        if (size < 10 || d + 10 > b.length) return null
        if ((b(d + 3) & 0xFF) != 0x9D || (b(d + 4) & 0xFF) != 0x01 ||
          (b(d + 5) & 0xFF) != 0x2A) return null
        return new GenericInternalRow(Array[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString("lossy"),
          u16le(d + 6) & 0x3FFF, u16le(d + 8) & 0x3FFF))
      }
      if (fourcc(p, "VP8L")) {
        val d = p + 8
        if (size < 5 || d + 5 > b.length) return null
        if ((b(d) & 0xFF) != 0x2F) return null
        val v = u32le(d + 1)
        return new GenericInternalRow(Array[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString("lossless"),
          (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1))
      }
      // unknown chunk: skip payload plus the even-offset pad byte; advance
      // in Long (the pad byte can push past length at the 2 GB boundary)
      val next = p.toLong + 8L + size + (size & 1L)
      if (next > b.length.toLong) return null
      p = next.toInt
    }
    null
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "webp_dims"
}
