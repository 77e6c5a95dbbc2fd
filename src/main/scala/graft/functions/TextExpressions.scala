package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One MD5 instance per (expression copy, thread): tasks deserialize
  * their own expression copies, but local mode can share one instance
  * across threads and MessageDigest is stateful — the same pattern as
  * the Confluent-Avro decoder's reader. Avoids a getInstance per row on
  * paths that hash millions of rows. */
private[functions] trait Md5Holder {
  @transient private lazy val local =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }
  protected def md5Instance: MessageDigest = local.get()
}

/** Native twin of `TextFunctions.hexSpanValSql` — the unsigned value of
  * hex digits [from, from+len) of a (md5) hex string as a place-value
  * sum. The SQL macro expands to `len` separate `instr∘substr` string
  * expressions PER ROW (13 for the standard 13-digit span — the repo's
  * deterministic bucketing/split primitive), which is the per-row tax on
  * every hash-heavy entry; this expression walks the span once, fully
  * inside whole-stage codegen (a static call, no CodegenFallback).
  *
  * Bit-exact contract (property-asserted in TextExpressionsSpec against
  * the macro on md5 output AND edge strings): per digit,
  * `instr('0123456789abcdef', substr(h, pos, 1)) - 1` — a hex char maps
  * to its value, a NON-hex char to -1 (indexOf miss → 0 − 1), and an
  * out-of-range position to 0 (substr yields '' and indexOf('') = 0 →
  * instr = 1). The oracle keeps the SQL macro; only Spark-side call
  * sites swap in the native form. */
case class HexSpanVal(child: Expression, from: Int, len: Int)
    extends UnaryExpression {
  require(from >= 0 && len >= 1 && len <= 15,
    s"hex span must be 0-based start >= 0 and 1..15 digits, got ($from, $len)")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    HexSpanVal.compute(input.asInstanceOf[UTF8String], from, len)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HexSpanVal$$.MODULE$$.compute($c, $from, $len)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "hex_span_val"
}

object HexSpanVal {
  def compute(s: UTF8String, from: Int, len: Int): Long = {
    val nChars = s.numChars()
    // md5 hex is ASCII (byte index == char index); fall back to the
    // string path for exotic inputs so char positions stay substr-exact
    val ascii = s.numBytes() == nChars
    val str = if (ascii) null else s.toString
    var acc = 0L
    var j = 0
    while (j < len) {
      val pos = from + j
      val d =
        if (pos >= nChars) 0L // substr past the end: '' → instr = 1 → 0
        else {
          val c = if (ascii) s.getByte(pos).toChar else str.charAt(pos)
          if (c >= '0' && c <= '9') (c - '0').toLong
          else if (c >= 'a' && c <= 'f') (c - 'a' + 10).toLong
          else -1L // non-hex digit: indexOf miss → instr = 0 → -1
        }
      acc += d << (4 * (len - 1 - j))
      j += 1
    }
    acc
  }
}

/** Fused shingle hasher for the MinHash/LSH pipeline: tokens → word
  * n-gram shingles → distinct (first-occurrence order) → lowercase-hex
  * md5 per shingle, in ONE pass with one reused digest and no
  * intermediate Catalyst arrays.
  *
  * Semantically identical to
  * `md5Array(array_distinct(shingles(tokens, n)))` — the composed form
  * stays the definition (and the DuckDB oracle's formulation); this
  * expression exists because the composed pipeline materializes three
  * arrays and re-walks UTF8String concat machinery per shingle, which is
  * the single hottest scan stage of the near-dup pipeline (measured ~3s
  * of q36's ~5s at sf0.1). Parity is asserted in TextExpressionsSpec.
  *
  * CodegenFallback: per-row cost is dominated by the md5 calls
  * themselves, not the eval boundary.
  */
case class Md5Shingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with Md5Holder {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> tokens, got $other")
  }

  @transient private lazy val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val md = md5Instance
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var first = true
      var k = 0
      while (k < n) {
        // null tokens are skipped like concat_ws does (never produced by
        // split(); guarded so a caller-built array can't NPE the task)
        if (!toks.isNullAt(i + k)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i + k).toString)
          first = false
        }
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      val digest = md.digest(
        it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(digest(b) & 0xf)
        b += 1
      }
      out(j) = UTF8String.fromString(new String(hex))
      md.reset()
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "md5_shingles"
}

/** Fused block-difference hash (the q137 dHash fingerprint): text is
  * cut into `blocks` equal code-point windows (width = max(1,
  * ⌈numChars/blocks⌉), exactly Spark's `substr` semantics — a window
  * past the end is the empty string, whose md5 still participates),
  * each window's md5's FIRST 8 HEX DIGITS become a 32-bit value, and
  * bit i of the result is v_i < v_{i+1} for i < `bits`.
  *
  * ≡ the composed pipeline
  * `aggregate(zip_with(slice(vs,1,bits), slice(vs,2,bits), (a,b) ->
  * a<b), …)` over `vs = transform(sequence(0, blocks-1), i ->
  * hexSpanVal(md5(substr(text, 1+i*w, w)), 0, 8))` — which stays the
  * definition and the DuckDB oracle's formulation (parity
  * property-asserted in TextExpressionsSpec, incl. multibyte and
  * astral text). This native form exists because the composed chain is
  * `blocks` interpreted lambda evaluations per row (higher-order
  * functions are CodegenFallback), the dominant stage of q137's wall.
  * One digest instance, one code-point walk, zero intermediate arrays.
  *
  * CodegenFallback: per-row cost is the md5 work itself. */
case class BlockDHash(child: Expression, blocks: Int, bits: Int)
    extends UnaryExpression with CodegenFallback with Md5Holder {

  require(blocks >= 2 && bits >= 1 && bits < blocks && bits <= 63,
    s"need 2 <= bits+1 <= blocks and bits <= 63, got blocks=$blocks bits=$bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val cps = text.codePointCount(0, text.length)
    val w = math.max(1, math.ceil(cps / blocks.toDouble).toInt)
    val md = md5Instance
    val vs = new Array[Long](blocks)
    var i = 0
    var startChar = 0 // char (UTF-16) offset of code point i*w, tracked
    val empty = Array.empty[Byte]
    while (i < blocks) {
      val s = i.toLong * w
      val bytes =
        if (s >= cps) empty
        else {
          val take = math.min(w.toLong, cps - s).toInt
          val endChar = text.offsetByCodePoints(startChar, take)
          val b = text.substring(startChar, endChar)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          startChar = endChar
          b
        }
      val d = md.digest(bytes)
      md.reset()
      // first 8 hex digits of the md5 = the first 4 digest bytes,
      // big-endian nibbles — hexSpanVal(md5hex, 0, 8) exactly
      vs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < bits) {
      if (vs(b) < vs(b + 1)) acc |= 1L << b
      b += 1
    }
    acc: java.lang.Long
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "block_dhash"
}

/** Fused shingle-SET builder: tokens → word n-gram shingles → distinct
  * (first-occurrence order), one pass, no intermediate arrays.
  *
  * Semantically identical to `array_distinct(shingles(tokens, n))` —
  * the composed form stays the definition (and the DuckDB oracle's
  * formulation); this expression exists because the composed pipeline
  * walks sequence→transform→slice→array_join→array_distinct in
  * interpreted eval per row, the dominant stage of the Jaccard-scored
  * dedup entries (r12: the q374 build was ~100% of its wall). Parity
  * with the composed form is property-asserted in TextExpressionsSpec.
  *
  * CodegenFallback: per-row cost is the string assembly itself. */
case class WordShingleSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> tokens, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var first = true
      var k = 0
      while (k < n) {
        // null tokens skipped like concat_ws/array_join (never produced
        // by split(); guarded so a caller-built array can't NPE the task)
        if (!toks.isNullAt(i + k)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i + k).toString)
          first = false
        }
        k += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "word_shingle_set"
}

/** Fused char k-gram hasher for winnowing fingerprints: text → md5 hex of
  * every k-char substring (position order, duplicates kept — winnowing
  * needs the positional sequence), one pass, one digest.
  *
  * ≡ `transform(sequence(1, length(text)-k+1), i -> md5(substr(text, i, k)))`
  * — the composed form stays the definition and the DuckDB oracle's
  * formulation (parity-spec'd). Positions index CODE POINTS like substr
  * does, so multi-byte text hashes identically to the composed form. */
case class CharGramsMd5(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback with Md5Holder {

  require(k >= 1, s"gram width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got $other")
  }

  @transient private lazy val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val cps = text.codePointCount(0, text.length)
    if (cps < k) return new GenericArrayData(Array.empty[Any])
    val md = md5Instance
    val out = new Array[Any](cps - k + 1)
    var startChar = 0
    var i = 0
    while (i <= cps - k) {
      val endChar = text.offsetByCodePoints(startChar, k)
      val digest = md.digest(text.substring(startChar, endChar)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(digest(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      md.reset()
      startChar = text.offsetByCodePoints(startChar, 1)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "char_grams_md5"
}

/** Whole-document simhash as ONE scan-side expression: md5 each token,
  * take bit j of the hash from hex digit j/4 (low-to-high within the
  * digit — the exact convention of `simhashBitSql`), majority-vote each
  * bit over the document's tokens, assemble bits low-to-high.
  *
  * ≡ the explode → md5 → per-bit popcount → 2·popcount ≥ n → assemble
  * pipeline (which stays the DuckDB oracle's formulation), but with no
  * explode, no 1M-row shuffle, and no hex strings — bit values come
  * straight from the digest nibbles (hex digit 2i is byte i's high
  * nibble). A document is one row in, one long out. */
case class SimhashBits(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback with Md5Holder {

  require(bits >= 1 && bits <= 64, s"bits must be 1..64, got $bits")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> tokens, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    // Empty token array: the exploded-pipeline formulation produces no row
    // for such a document (so "all bits tie at 0-of-0" is out of contract);
    // 0L is the only answer that keeps x XOR x == 0 self-similarity.
    if (n == 0) return 0L
    val counts = new Array[Int](bits)
    val md = md5Instance
    var i = 0
    while (i < n) {
      // null tokens count toward n (like count(*) in the exploded oracle
      // pipeline) but contribute no bits (md5(null) is null there)
      if (!toks.isNullAt(i)) {
        val digest = md.digest(toks.getUTF8String(i).getBytes)
        var j = 0
        while (j < bits) {
          val hexIdx = j / 4 // 0-based hex digit index
          val byte = digest(hexIdx / 2)
          // even hex index = high nibble of the byte, odd = low nibble
          val v = if ((hexIdx & 1) == 0) (byte >> 4) & 0xf else byte & 0xf
          counts(j) += (v >> (j % 4)) & 1
          j += 1
        }
        md.reset()
      }
      i += 1
    }
    var value = 0L
    var j = 0
    while (j < bits) {
      if (2L * counts(j) >= n) value |= 1L << j
      j += 1
    }
    value
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash_bits"
}

/** Intersection size of two SORTED string arrays by two-pointer merge —
  * O(n+m) with zero per-row allocation, vs array_intersect's per-row
  * hash set. The LSH verify stage calls this on tens of thousands of
  * candidate pairs per partition; inputs are the sorted distinct md5'd
  * shingle sets. ≡ size(array_intersect(a, b)) for duplicate-free sorted
  * null-free inputs (parity-spec'd); null elements are skipped — they
  * never count toward the intersection. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<string> inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var count = 0L
    while (i < n && j < m) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { count += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    count
  }

  // The verify stage runs this on every candidate pair — a codegen'd
  // merge loop keeps the whole filter inside one WholeStageCodegen span
  // instead of paying the interpreted-eval boundary per pair.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt"); val c = ctx.freshName("c")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    final int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($c == 0) { $cnt++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_count"
}

/** Sliding-window minimum over a string array: out(j) = min(in(j..j+w-1)),
  * for winnowing's fingerprint-selection stage. Direct O(n·w) compare
  * loop (w is small — the winnow window), zero allocation per window,
  * vs the composed transform+slice+array_min which allocates a w-array
  * per window position. ≡ transform(sequence(1, n-w+1), j →
  * array_min(slice(a, j, w))) — parity-spec'd. Null elements follow
  * array_min: ignored, and an all-null window yields a null element. */
case class SlidingMins(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> input, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    var j = 0
    while (j <= n - w) {
      var best: UTF8String = null
      var i = j
      while (i < j + w) {
        if (!a.isNullAt(i)) {
          val c = a.getUTF8String(i)
          if (best == null || c.compareTo(best) < 0) best = c
        }
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  // Compare-only inner loop (w is small) — codegen keeps the winnowing
  // scan stage inside the surrounding WholeStageCodegen span.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val jj = ctx.freshName("j"); val ii = ctx.freshName("i")
      val best = ctx.freshName("best"); val cc = ctx.freshName("c")
      s"""
         |final int $n = $a.numElements();
         |if ($n < $w) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  final Object[] $out = new Object[$n - $w + 1];
         |  for (int $jj = 0; $jj <= $n - $w; $jj++) {
         |    $utf8 $best = null;
         |    for (int $ii = $jj; $ii < $jj + $w; $ii++) {
         |      if (!$a.isNullAt($ii)) {
         |        final $utf8 $cc = $a.getUTF8String($ii);
         |        if ($best == null || $cc.compareTo($best) < 0) { $best = $cc; }
         |      }
         |    }
         |    $out[$jj] = $best;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "sliding_mins"
}

/** Native table-generating function (the UDTF tier of §2.9): text →
  * one row per positional char k-gram, as (pos INT 1-based, gram
  * STRING). ≡ `posexplode(transform(sequence(1, length(t)-k+1),
  * i -> substr(t, i, k)))` shifted to 1-based — the composed form stays
  * the definition and the DuckDB oracle's formulation
  * (`generate_series` + `substring`), parity-spec'd — but emits rows
  * lazily with no intermediate gram array (a 100 kB document would
  * otherwise materialize ~100k-element Catalyst arrays per row).
  * Positions index CODE POINTS like substr, so multi-byte text
  * generates identically to the composed form. */
case class PosCharGrams(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with CodegenFallback {

  require(k >= 1, s"gram width must be >= 1, got $k")

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("gram", StringType,
        nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val text = v.asInstanceOf[UTF8String].toString
    val cps = text.codePointCount(0, text.length)
    if (cps < k) return Iterator.empty
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      private var startChar = 0
      private var i = 0
      override def hasNext: Boolean = i <= cps - k
      override def next(): org.apache.spark.sql.catalyst.InternalRow = {
        val endChar = text.offsetByCodePoints(startChar, k)
        val row = org.apache.spark.sql.catalyst.InternalRow(
          i + 1, UTF8String.fromString(text.substring(startChar, endChar)))
        startChar = text.offsetByCodePoints(startChar, 1)
        i += 1
        row
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pos_char_grams"
}

/** Winnowed token-window fingerprints in ONE native pass: rolling
  * polynomial hash over per-token FNV-1a 64 hashes gives every k-token
  * window hash in O(n) (no window strings are ever materialized — the
  * composed transform(array_join(slice)) form built ~k chars per
  * token position and was the top isolated bench entry), then winnowing
  * selects each w-window's minimum, deduplicated in first-occurrence
  * order. Output: array<long> of selected fingerprints; empty when the
  * doc has fewer than k tokens or fewer than w window positions.
  *
  * The fingerprint VALUES are an internal candidate-generation device
  * (q242's oracle brute-forces all windows; the winnowing guarantee —
  * any shared run of ≥ k+w−1 tokens yields a shared selected
  * fingerprint — holds for ANY deterministic window hash, and a
  * collision can only ADD a candidate that exact verification then
  * discards). Unsigned-wraparound arithmetic (mod 2^64) keeps the
  * rolling update exact: h(i+1) = (h(i) − t_i·M^(k−1))·M + t_{i+k}. */
case class WinnowedTokenFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  private val M = 6364136223846793005L // odd ⇒ invertible mod 2^64
  private val powK1: Long = {
    var p = 1L; var i = 0
    while (i < k - 1) { p *= M; i += 1 }
    p
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> input, got $other")
  }

  private def fnv1a(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (a.isNullAt(i)) 0L else fnv1a(a.getUTF8String(i).getBytes)
      i += 1
    }
    val m = n - k + 1
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val wh = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * M + th(i); i += 1 }
    wh(0) = h
    i = 1
    while (i < m) {
      h = (h - th(i - 1) * powK1) * M + th(i + k - 1)
      wh(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= m - w) {
      var best = wh(j)
      i = j + 1
      while (i < j + w) { if (wh(i) < best) best = wh(i); i += 1 }
      seen.add(best): Unit
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "winnowed_token_fingerprints"
}

/** Jaro–Winkler similarity of two strings — classic Winkler variant,
  * pinned to match DuckDB's `jaro_winkler_similarity` (the oracle
  * engine) bit-for-bit: match window `max(len)/2 − 1` clamped at 0,
  * transpositions = floor(out-of-order matches / 2), prefix bonus
  * `l·0.1·(1−jaro)` for the common prefix capped at 4 applied only when
  * jaro > 0.7 (boost threshold), and 0.0 when EITHER side is empty
  * (DuckDB returns 0 even for ''≡''). The blocked entity-resolution
  * join (q312) evaluates this on every in-block candidate pair, so the
  * scorer is a static call inside the codegen span — no interpreted
  * boundary per pair. */
case class JaroWinkler(
    left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two string inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerAlgo.score($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerAlgo {
  /** See JaroWinkler's doc for the pinned semantics. Compares the raw
    * UTF-8 BYTES of each string — exactly what DuckDB's
    * `jaro_winkler_similarity` does — so scores agree with the oracle
    * byte-for-byte on non-ASCII input too (ADVICE r9: the former
    * UTF-16 walk diverged on any multi-byte code point; a é counts as
    * two byte positions here, as in DuckDB). Also skips the
    * UTF8String→String decode per call. */
  def score(aU: UTF8String, bU: UTF8String): Double = {
    val a = aU.getBytes
    val b = bU.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val bMatched = new Array[Boolean](lb)
    val aMatchPos = new Array[Int](math.min(la, lb))
    var m = 0
    var i = 0
    while (i < la) {
      val ca = a(i)
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var hit = false
      while (j <= hi && !hit) {
        if (!bMatched(j) && ca == b(j)) {
          bMatched(j) = true
          aMatchPos(m) = i
          m += 1
          hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // walk matched bytes of both sides in order; count disagreements
    var mism = 0
    var k = 0
    i = 0
    while (i < m) {
      while (!bMatched(k)) k += 1
      if (a(aMatchPos(i)) != b(k)) mism += 1
      k += 1
      i += 1
    }
    val t = mism / 2 // floor — matches the oracle engine
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Damerau–Levenshtein edit distance (FULL Lowrance–Wagner variant, not
  * the restricted OSA), pinned to match DuckDB's `damerau_levenshtein`
  * (the oracle engine) bit-for-bit: it operates on the raw UTF-8 BYTES
  * of each string (so `éa`→`aé` costs 2, the two-byte é never forming
  * an adjacent transposition — exactly what the oracle returns) and
  * allows a transposition to span previously-edited material
  * (`CA`→`ABC` = 2, where OSA gives 3). Cost model: unit
  * insert/delete/substitute/transpose. The blocked spell-variant join
  * (q370) evaluates this on every in-block candidate pair, so the
  * scorer is a static call inside the codegen span. */
case class DamerauLevenshtein(
    left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two string inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauAlgo.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauAlgo.distance($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "damerau_levenshtein"
}

object DamerauAlgo {
  /** Lowrance–Wagner full DL over UTF-8 bytes (see DamerauLevenshtein's
    * doc for the pinned semantics). The classic (la+2)×(lb+2) matrix
    * with a 256-slot last-seen-row index per byte value; O(la·lb) time,
    * allocation bounded by the two input lengths (strings in the
    * catalog's use are short name/title fields, so the quadratic cost
    * is per-pair trivial — the cost driver is the candidate-pair count,
    * which blocking bounds). */
  def distance(aU: UTF8String, bU: UTF8String): Long = {
    val a = aU.getBytes
    val b = bU.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val inf = la + lb
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= lb) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = new Array[Int](256) // last row where each byte value occurred
    i = 1
    while (i <= la) {
      var db = 0 // last column in row i where a match occurred
      val ca = a(i - 1) & 0xFF
      j = 1
      while (j <= lb) {
        val cb = b(j - 1) & 0xFF
        val k = da(cb)
        val l = db
        val cost = if (ca == cb) { db = j; 0 } else 1
        val subst = d(i * w + j) + cost
        val insert = d((i + 1) * w + j) + 1
        val delete = d(i * w + j + 1) + 1
        val transp = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = subst
        if (insert < m) m = insert
        if (delete < m) m = delete
        if (transp < m) m = transp
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da(ca) = i
      i += 1
    }
    d((la + 1) * w + lb + 1).toLong
  }
}
