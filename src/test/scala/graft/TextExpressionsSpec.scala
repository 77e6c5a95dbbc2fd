package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

/** Md5Shingles must equal the composed
  * md5Array(array_distinct(shingles(tokens, n))) pipeline element-for-
  * element (values AND first-occurrence order) on real documents, plus
  * the short-input edge cases. */
class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("fused expression matches the composed pipeline on documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(1, 3, 5)) {
      val bad = docs.select(
        md5Shingles(tokens(col("text")), n).as("fused"),
        md5Array(array_distinct(shingles(tokens(col("text")), n))).as("composed"))
        .filter(col("fused") =!= col("composed"))
        .count()
      assert(bad == 0, s"n=$n")
    }
  }

  test("inputs shorter than n produce an empty array") {
    import spark.implicits._
    val df = Seq("one two", "one", "").toDF("text")
    val out = df.select(md5Shingles(tokens(col("text")), 3).as("hs"))
      .collect().map(_.getSeq[String](0))
    assert(out.forall(_.isEmpty))
  }

  test("WordShingleSet matches array_distinct(shingles(tokens)) on documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(1, 3, 5)) {
      val bad = docs.select(
        shingleSet(tokens(col("text")), n).as("fused"),
        array_distinct(shingles(tokens(col("text")), n)).as("composed"))
        .filter(col("fused") =!= col("composed"))
        .count()
      assert(bad == 0, s"n=$n")
    }
    // short-input + duplicate-token edges, values AND order
    import spark.implicits._
    val edge = Seq("a b a b a", "x x x", "one two", "").toDF("text")
    val rows = edge.select(
      shingleSet(tokens(col("text")), 2).as("fused"),
      array_distinct(shingles(tokens(col("text")), 2)).as("composed"))
      .collect()
    rows.foreach(r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
    // NULL text (ADVICE r12): the wrapper must preserve the composed
    // form's contract — when(size(toks) >= n, ...).otherwise(array())
    // yields an EMPTY array for a null text row, never NULL, so Jaccard
    // denominators at the 7 dedup call sites are unchanged by the fused
    // expression swap.
    val nullRow = Seq(Option.empty[String], Some("a b c")).toDF("text")
      .select(shingleSet(tokens(col("text")), 2).as("fused"))
      .collect()
    assert(nullRow.forall(!_.isNullAt(0)),
      "shingleSet(NULL tokens) must be [] (the composed-form contract)")
    assert(nullRow.exists(_.getSeq[String](0).isEmpty))
  }

  test("HexSpanVal matches the hexSpanValSql macro bit-for-bit") {
    import graft.functions.TextFunctions.{hexSpanVal, hexSpanValSql}
    // real md5 strings over documents, several spans incl. the standard
    // 13-digit bucketing span
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(md5(col("text")).as("h"))
    for ((f, l) <- Seq((0, 13), (0, 5), (7, 8), (17, 15), (31, 1))) {
      val bad = docs.select(hexSpanVal(col("h"), f, l).as("nat"),
        expr(hexSpanValSql("h", f, l)).as("mac"))
        .filter(col("nat") =!= col("mac")).count()
      assert(bad == 0, s"span ($f,$l)")
    }
    // edge strings: short, empty, non-hex, uppercase, multibyte — the
    // native form must reproduce the macro's instr/substr semantics
    import spark.implicits._
    val edge = Seq("", "a", "0f", "XYZ!", "ABCDEF0123456789",
      "é0aé", "deadbeef").toDF("h")
    val rows = edge.select(col("h"), hexSpanVal(col("h"), 1, 4).as("nat"),
      expr(hexSpanValSql("h", 1, 4)).as("mac")).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }

  test("char-gram hasher matches the composed transform/substr pipeline") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (k <- Seq(1, 5, 9)) {
      val bad = docs.select(
        charGramsMd5(col("text"), k).as("fused"),
        expr(s"transform(sequence(1, length(text) - ${k - 1}), i -> md5(substr(text, i, $k)))")
          .as("composed"))
        .filter(length(col("text")) >= k)
        .filter(col("fused") =!= col("composed"))
        .count()
      assert(bad == 0, s"k=$k")
    }
    // short input → empty
    import spark.implicits._
    val short = Seq("abc").toDF("text")
      .select(charGramsMd5(col("text"), 5)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("scan-side simhash matches the exploded packed-lane pipeline") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (bits <- Seq(16, 32)) {
      val nDigits = bits / 4
      val digits = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .select(col("doc_id"), md5(col("tok")).as("mh"))
        .select(col("doc_id") +: (0 until nDigits).map(p =>
          expr(hexDigitValSql("mh", p + 1)).as(s"v$p")): _*)
      val sums = digits.groupBy("doc_id").agg(
        count(lit(1)).as("n"),
        (0 until nDigits).map(p =>
          sum(expr(packedBitLanesSql(s"v$p"))).cast("long").as(s"ps$p")): _*)
      val assemble = (0 until bits)
        .map(j => s"${simhashBitFromLanesSql(j)} * ${1L << j}")
        .mkString(" + ")
      val composed = sums.select(col("doc_id"),
        expr(assemble).cast("long").as("composed"))
      val fused = docs.select(col("doc_id"),
        simhashOf(tokens(col("text")), bits).as("fused"))
      val bad = fused.join(composed, "doc_id")
        .filter(col("fused") =!= col("composed")).count()
      assert(bad == 0, s"bits=$bits")
    }
  }

  test("sorted-intersect count matches size(array_intersect) on shingle sets") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hs = docs.select(col("doc_id"),
      sort_array(md5Shingles(tokens(col("text")), 3)).as("hs"))
    val a = hs.limit(40).select(col("doc_id").as("ia"), col("hs").as("sa"))
    val b = hs.limit(40).select(col("doc_id").as("ib"), col("hs").as("sb"))
    val bad = a.crossJoin(b)
      .select(
        sortedIntersectCount(col("sa"), col("sb")).as("fused"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("composed"))
      .filter(col("fused") =!= col("composed"))
      .count()
    assert(bad == 0)
    // empty-side edge
    import spark.implicits._
    val e = Seq((Seq.empty[String], Seq("aa", "bb"))).toDF("x", "y")
      .select(sortedIntersectCount(col("x"), col("y"))).head().getLong(0)
    assert(e == 0L)
  }

  test("sliding mins match the composed transform/slice/array_min form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (w <- Seq(1, 4, 7)) {
      val gh = docs.select(charGramsMd5(col("text"), 5).as("gh"))
        .filter(size(col("gh")) >= w)
      val bad = gh.select(
        slidingMins(col("gh"), w).as("fused"),
        expr(s"transform(sequence(1, size(gh) - ${w - 1}), j -> array_min(slice(gh, j, $w)))")
          .as("composed"))
        .filter(col("fused") =!= col("composed"))
        .count()
      assert(bad == 0, s"w=$w")
    }
    import spark.implicits._
    val short = Seq(Seq("a", "b")).toDF("a")
      .select(slidingMins(col("a"), 4)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("compare-loop expressions compile under forced codegen and agree with eval") {
    // Whole-stage codegen failures fall back to interpreted eval silently;
    // generating the projection directly makes a codegen bug a hard failure.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{SlidingMins, SortedIntersectCount}
    val at = ArrayType(StringType)
    val a = BoundReference(0, at, nullable = true)
    val b = BoundReference(1, at, nullable = true)
    val proj = GenerateUnsafeProjection.generate(
      Seq(SortedIntersectCount(a, b), SlidingMins(a, 2), SlidingMins(a, 5)))
    def arr(xs: String*) = new GenericArrayData(
      xs.map(x => if (x == null) null else UTF8String.fromString(x)).toArray[Any])
    val out = proj(InternalRow(arr("aa", "bb", "cc", "dd"), arr("bb", "dd", "ee")))
    assert(out.getLong(0) == 2L)
    assert(out.getArray(1).toSeq[UTF8String](StringType).map(_.toString)
      == Seq("aa", "bb", "cc"))
    assert(out.getArray(2).numElements() == 0) // n < w → empty
    // null elements: never counted by the intersect; ignored by the
    // window min (array_min semantics)
    val withNulls = proj(InternalRow(arr(null, "aa", "bb"), arr(null, "aa")))
    assert(withNulls.getLong(0) == 1L)
    assert(withNulls.getArray(1).toSeq[UTF8String](StringType).map(_.toString)
      == Seq("aa", "aa"))
  }

  test("duplicate shingles dedupe with first-occurrence order") {
    import spark.implicits._
    val df = Seq("a b a b a b").toDF("text") // shingles: "a b a","b a b","a b a","b a b"
    val fused = df.select(md5Shingles(tokens(col("text")), 3)).head().getSeq[String](0)
    val composed = df.select(
      md5Array(array_distinct(shingles(tokens(col("text")), 3))))
      .head().getSeq[String](0)
    assert(fused == composed)
    assert(fused.length == 2)
  }

  test("pos_char_grams generator matches the posexplode composition incl. multi-byte") {
    import spark.implicits._
    import graft.functions.TextFunctions.posCharGrams
    val df = Seq("abcde", "héllo wörld", "日本語のテキスト", "ab", "")
      .toDF("text")
    for (k <- Seq(1, 3)) {
      val gen = df.select(col("text"), posCharGrams(col("text"), k).as(Seq("pos", "gram")))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      val composed = df
        .select(col("text"), posexplode(expr(
          // guard: sequence(1, 0) would generate DESCENDING [1, 0]
          s"""CASE WHEN length(text) >= $k
             |  THEN transform(sequence(1, length(text) - $k + 1),
             |         i -> substr(text, i, $k))
             |  ELSE array() END""".stripMargin))
          .as(Seq("pos0", "gram")))
        .select(col("text"), (col("pos0") + 1).cast("int").as("pos"), col("gram"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      assert(gen == composed, s"k=$k")
    }
  }

  /** Jaro-Winkler parity: the native expression must match the oracle
    * engine's jaro_winkler_similarity BIT-FOR-BIT on these DuckDB-
    * generated probe vectors (60 seeded random pairs + the published
    * worked examples + the edge/boundary probes that pinned the
    * semantics: floor'd transpositions, 0.7 boost threshold, prefix cap
    * 4, empty -> 0). */
  test("jaro-winkler matches the oracle engine exactly") {
    import spark.implicits._
    val vectors: Seq[(String, String, Double)] = Seq(
    ("aaxcbbbxax", "eaedaaabbee", 0.5848484848484848d),
    ("", "bxxxedbd", 0.0d),
    ("c  a  bxd", "cbb c", 0.5407407407407407d),
    ("a", "ac cec", 0.7500000000000001d),
    ("axdeadaec xe", "ebxaa", 0.6277777777777778d),
    ("b ca b adc", "x cbccb", 0.6047619047619048d),
    ("cxxxaexbex", "bdd", 0.0d),
    ("xxeb", "c   ab a c", 0.45d),
    ("cabexc", "xdd", 0.0d),
    ("dbcbbxeecx", "dedcbbeda", 0.6185185185185186d),
    ("a abxb xdead", "edece", 0.42777777777777776d),
    ("", "xaxe c xca", 0.0d),
    ("dbda", "xce bea xc", 0.5666666666666667d),
    ("eebbc be e", "", 0.0d),
    ("cdaac  cb", "", 0.0d),
    ("eaa", "d a e bbxde", 0.44949494949494945d),
    ("ce", "dbe xxbxc", 0.5370370370370371d),
    ("xxcded", "b", 0.0d),
    ("aca", "ebebaaxxa", 0.48148148148148145d),
    ("aa", "aebcx", 0.5666666666666667d),
    ("bebxeed", "d", 0.0d),
    ("baaxdc", "dd xax", 0.38888888888888884d),
    ("xaadxc  ab", "bed", 0.4777777777777778d),
    ("db", "db a", 0.8666666666666667d),
    ("eaax", "aa  bbd", 0.5952380952380952d),
    ("db dabd", "", 0.0d),
    ("c  dcd", "x exxdbbcba", 0.5909090909090909d),
    ("xeaxcaaed", "ebaea b", 0.5873015873015873d),
    ("e", "x", 0.0d),
    ("dae", "eea", 0.0d),
    ("adxeeeccb", "xcbcdbxxcd", 0.5518518518518518d),
    ("aade", "aaebecbca", 0.6944444444444443d),
    ("ccb", "exce x", 0.5d),
    ("ax ecxab", "aaxe", 0.7375d),
    ("cc", "bxcbxx ce", 0.5370370370370371d),
    ("c aaxd", "aac", 0.7222222222222222d),
    ("xc", "xd", 0.6666666666666666d),
    ("xdeaaaxb", "a ceebdb", 0.47222222222222215d),
    ("", "c  a", 0.0d),
    ("bxbxa", "e de", 0.0d),
    ("bb b  bdabx", "d x", 0.47474747474747475d),
    ("bcb xad a", "bb dcc", 0.662962962962963d),
    ("bbaxbdcc a", "cxed", 0.5666666666666667d),
    ("ecaacbeca", "e", 0.7333333333333334d),
    ("cx cde", "adebcaxd", 0.5138888888888888d),
    ("", "exxxxxb", 0.0d),
    ("daxce", "x axc", 0.7333333333333334d),
    ("cxdcdxce", "bd", 0.5416666666666666d),
    ("dxxbeecde", "", 0.0d),
    ("cbd", "excdddxbe", 0.6296296296296297d),
    ("xbxac", "xxeca  b", 0.6833333333333332d),
    ("cb bbaabde", "addxebxxdddb", 0.5722222222222223d),
    ("xx", "", 0.0d),
    ("a dbb xeda", "b adb dx", 0.85d),
    ("eec de x", "d edbx d", 0.6166666666666667d),
    ("c b xc", "edxbcdaxcbcc", 0.5833333333333334d),
    ("eabbb", "xbxbad", 0.5777777777777778d),
    ("ceddab", "d exa", 0.5888888888888889d),
    ("eddacc d  de", "xe ebdbcdda", 0.6262626262626263d),
    ("cxx dx", "d", 0.0d),
    ("MARTHA", "MARHTA", 0.9611111111111111d),
    ("DIXON", "DICKSONX", 0.8133333333333332d),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964d),
    ("abc", "abc", 1.0d),
    ("", "abc", 0.0d),
    ("", "", 0.0d),
    ("a", "b", 0.0d),
    ("a", "a", 1.0d),
    ("CRATE", "TRACE", 0.7333333333333334d),
    ("DwAyNE", "DuANE", 0.8400000000000001d),
    ("lemon tan", "lemon tin", 0.9555555555555556d),
    ("aXXXXXX", "aYYYYYY", 0.42857142857142855d),
    ("abcdYYYY", "abcdXXXX", 0.6666666666666666d),
    ("ab", "aba", 0.9111111111111111d),
    ("aaaaa", "aaaaaa", 0.9666666666666667d),
    ("prefixmatch", "prefixnomat", 0.9272727272727274d),
    ("xxabcyy", "xxbcayy", 0.9619047619047619d),
    // non-ASCII probes (ADVICE r9): the scorer compares raw UTF-8
    // BYTES, exactly like the oracle engine — a multi-byte code point
    // counts as several positions on both sides. DuckDB-generated.
    ("café", "cafe", 0.8483333333333334d),
    ("café", "café", 1.0d),
    ("über", "uber", 0.7833333333333333d),
    ("naïve", "naive", 0.8577777777777779d),
    ("日本語", "日本語テキスト", 0.8857142857142858d),
    ("résumé", "resume", 0.75d),
    ("Müller", "Mueller", 0.8285714285714287d),
    ("español", "espanol", 0.9214285714285715d),
    ("中文", "英文", 0.6666666666666666d),
    ("αβγδε", "αβγξε", 0.96d),
    ("Łódź", "Lodz", 0.46428571428571425d),
    ("smörgåsbord", "smorgasbord", 0.8694638694638694d),
    )
    val df = vectors.toDF("a", "b", "want")
    val bad = df
      .select(col("a"), col("b"), col("want"),
        jaroWinkler(col("a"), col("b")).as("got"))
      .filter(col("got") =!= col("want"))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }

  /** Damerau–Levenshtein parity: the native expression must match the
    * oracle engine's damerau_levenshtein EXACTLY on these DuckDB-
    * generated probe vectors (30 seeded random pairs + the published
    * worked examples + the probes that pin the semantics: FULL
    * Lowrance–Wagner — transpositions may span edited material, so
    * CA→ABC costs 2 where OSA gives 3 — and raw UTF-8 BYTE comparison,
    * so the two-byte é never forms an adjacent transposition:
    * éa→aé = 2). */
  test("damerau-levenshtein matches the oracle engine exactly") {
    import spark.implicits._
    val vectors: Seq[(String, String, Long)] = Seq(
      ("bdxaa", "aceaebaa", 6L),
      ("dabaed", "", 6L),
      ("abxxeaeed", "", 9L),
      ("ae ", "cd", 3L),
      ("ea", "ce xbaeex", 7L),
      ("cae", "aeaebdxed c", 9L),
      ("edccb b", " baecedcxdc", 8L),
      ("aaedb cbd", "axa ee", 7L),
      ("cxced", " da acdxx", 8L),
      ("a", "xcxex dcxdx", 11L),
      ("adcbe", "d", 4L),
      ("", " cb", 3L),
      ("bdd dabddec", " d", 9L),
      ("cxdcxdbb", "b", 7L),
      ("bx", "ad ", 3L),
      ("bccabdece", "cbx eexxx", 8L),
      ("", "   x ed", 7L),
      ("ddadxd", "", 6L),
      ("abd", "ac", 2L),
      ("aaaebeace", "", 9L),
      (" ", "edb", 3L),
      ("ccecdaa dd", "dcabaxc", 8L),
      ("cd xbeabecb", "ea ecx ax c", 9L),
      ("cbc bee ", "cxbe    ", 5L),
      (" b ", "x bbed", 4L),
      ("xaa c", "cbxecd ", 6L),
      ("ccababdbcbd", "e adxc xa", 9L),
      ("ad x bdbd ", "ca xdddxax", 7L),
      ("bb", "", 2L),
      ("ed", "be edxcbee", 8L),
      ("CA", "ABC", 2L),
      ("ABC", "CA", 2L),
      ("ab", "ba", 1L),
      ("smtih", "smith", 1L),
      ("kitten", "sitting", 3L),
      ("éa", "aé", 2L),
      ("héllo", "hello", 2L),
      ("", "", 0L),
      ("", "abc", 3L),
      ("abc", "", 3L),
      ("a", "a", 0L),
      ("ba", "ab", 1L),
      ("red widget", "red widgte", 1L),
      ("teh cat", "the cat", 1L),
      ("abcdef", "abcfed", 2L),
      ("aabb", "bbaa", 3L),
      ("ifshe", "fishe", 1L),
      ("café", "cafe", 2L),
      ("日本語", "本日語", 4L),
      ("aXcdXba", "abcdXba", 1L),
      ("specter", "spectre", 1L),
      ("tranpsose far", "transpose far", 1L),
    )
    val df = vectors.toDF("a", "b", "want")
    val bad = df
      .select(col("a"), col("b"), col("want"),
        damerauLevenshtein(col("a"), col("b")).as("got"))
      .filter(col("got") =!= col("want"))
      .collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
    // symmetry on the random block
    val sym = df.select(
        damerauLevenshtein(col("a"), col("b")).as("ab"),
        damerauLevenshtein(col("b"), col("a")).as("ba"))
      .filter(col("ab") =!= col("ba")).count()
    assert(sym == 0)
  }

  test("block dhash matches the composed digest-transform + comparison fold") {
    import spark.implicits._
    val blocks = 49
    val bits = blocks - 1
    val rnd = new scala.util.Random(137)
    val alphabet = "abc XYZ 0189_é中文😀" // incl. 2/3/4-byte UTF-8
    val texts = Seq("", "x", "short text", alphabet,
      alphabet * 11, "😀" * 100) ++
      (1 to 40).map(_ => (0 until rnd.nextInt(300))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val vExpr = graft.functions.TextFunctions.hexSpanValSql("m", 0, 8)
    val composed = expr(
      s"""aggregate(
         |  zip_with(
         |    slice(vs, 1, $bits), slice(vs, 2, $bits),
         |    (a, b) -> CAST(a < b AS INT)),
         |  named_struct('i', 0, 'acc', CAST(0 AS BIGINT)),
         |  (st, bit) -> named_struct(
         |    'i', st.i + 1,
         |    'acc', st.acc + CASE WHEN bit = 1
         |      THEN shiftleft(CAST(1 AS BIGINT), st.i)
         |      ELSE CAST(0 AS BIGINT) END),
         |  st -> st.acc)""".stripMargin)
    val bad = texts.toDF("text")
      .withColumn("vs", expr(
        s"""transform(
           |  transform(sequence(0, ${blocks - 1}), i -> md5(substr(text,
           |    1 + i * greatest(1, CAST(ceil(length(text) / $blocks.0)
           |      AS INT)),
           |    greatest(1, CAST(ceil(length(text) / $blocks.0) AS INT))))),
           |  m -> $vExpr)""".stripMargin))
      .select(col("text"), composed.as("want"),
        graft.functions.TextFunctions
          .blockDHash(col("text"), blocks, bits).as("got"))
      .filter(col("got") =!= col("want"))
      .collect()
    assert(bad.isEmpty,
      bad.take(3).map(r => s"'${r.getString(0).take(30)}' want=${r.get(1)} got=${r.get(2)}")
        .mkString("; "))
    // NULL text follows expression null semantics on both forms
    val n = Seq((1, null: String)).toDF("i", "text")
      .select(graft.functions.TextFunctions
        .blockDHash(col("text"), blocks, bits).as("h"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

}
