package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StructField, StructType}

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
          if (pos + 8 >= b.length) return null
          val h = ((b(pos + 5) & 0xFF) << 8) | (b(pos + 6) & 0xFF)
          val w = ((b(pos + 7) & 0xFF) << 8) | (b(pos + 8) & 0xFF)
          return new GenericInternalRow(Array[Any](w, h))
        case _ =>
          val len = ((b(pos + 2) & 0xFF) << 8) | (b(pos + 3) & 0xFF)
          if (len < 2 || pos + 2 + len > b.length) return null // truncated
          pos += 2 + len
      }
    }
    null
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "jpeg_sof_dims"
}
