package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar decode functions for the Kafka record plane (SURVEY.md §2.2).
  * All pure Column expressions — codegen'd, no UDFs in the hot path.
  */
object Decoders {

  /** F2: the reference's key-decode cascade (lambda_function.py:146-162) —
    * try UTF-8 string; else a 4-byte big-endian signed int; else lossy ASCII.
    *
    * Pure-Column re-expression: a byte sequence is valid UTF-8 iff
    * re-encoding its decoded form reproduces the bytes (decode() substitutes
    * U+FFFD on invalid input, so the round-trip differs exactly when the
    * Python StringDeserializer would have raised). The int branch mirrors
    * Kafka's IntegerDeserializer (4-byte big-endian, signed) via
    * conv(hex) with two's-complement correction.
    */
  def decodeKey(key: Column): Column = {
    val isValidUtf8 = call_function("is_valid_utf8", key)
    val unsigned = conv(hex(key), 16, 10).cast("long")
    val signedInt = when(unsigned > Int.MaxValue.toLong, unsigned - 4294967296L)
      .otherwise(unsigned)
    when(isValidUtf8, decode(key, "UTF-8"))
      .when(length(key) === 4, signedInt.cast("string"))
      // lossy fallback ≈ the reference's last-resort ascii decode:
      // invalid sequences become U+FFFD instead of raising
      .otherwise(call_function("make_valid_utf8", key))
  }

  /** F6: processing-time partition-path parts, zero-padded
    * (lambda_function.py:57,75-77). Event-time variant: pass the event
    * timestamp column instead of current_timestamp(). */
  def partitionParts(ts: Column): Seq[(String, Column)] = Seq(
    "year"  -> date_format(ts, "yyyy"),
    "month" -> date_format(ts, "MM"),
    "day"   -> date_format(ts, "dd"),
    "hour"  -> date_format(ts, "HH"))
}
