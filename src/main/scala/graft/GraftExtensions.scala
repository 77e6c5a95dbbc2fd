package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CharGramsMd5, ConfluentAvroDecode, CosineSim, NfcNormalize,
  DotProduct, JpegSofDims, Md5Shingles, PosCharGrams, SimhashBits, SlidingMins,
  SortedIntersectCount, WordShingleSet}

/** SparkSessionExtensions hook: registers the engine's custom Catalyst
  * expressions as SQL functions, so a pure-SQL user (spark.sql, JDBC,
  * SQL files) gets the same operators as the Column API:
  *
  *   - vec_dot(a, b)          — codegen'd sequential dot product
  *   - vec_cosine(a, b)       — one-pass cosine similarity
  *   - confluent_avro(v, schemaJson) — Confluent-framed Avro decode
  *
  *   - md5_shingles(tokens, n)   — distinct word n-grams → md5 array
  *   - char_grams_md5(text, k)   — positional char k-grams → md5 array
  *   - simhash_bits(tokens, b)   — whole-document simhash, scan-side
  *   - sorted_intersect_count(a, b) — |a ∩ b| for sorted string arrays
  *
  * Wire up either way:
  *   SparkSession.builder().withExtensions(new GraftExtensions) — code, or
  *   spark.sql.extensions=graft.GraftExtensions                 — config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom physical operator: native sort-merge as-of join
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // optimizer rule: canonical HOF dot-product fold → native vec_dot
    // (see plans/VectorFoldRewrite for the soundness argument; disable
    // with spark.graft.rewriteVectorFolds=false)
    ext.injectOptimizerRule(_ => graft.plans.VectorFoldRewrite)

    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential dot product of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes two arguments")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_cosine(a, b) takes two arguments")
        CosineSim(args(0), args(1))
      }))
    def avroBuilder(name: String, permissive: Boolean)
        : Seq[Expression] => Expression = { args =>
      require(args.length == 2, s"$name(value, schemaJson) takes two arguments")
      val schemaJson = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(s, _) if s != null =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"$name schema must be a string literal, got $other")
      }
      ConfluentAvroDecode(args(0), schemaJson, permissive)
    }
    ext.injectFunction((FunctionIdentifier("confluent_avro"),
      info("confluent_avro",
        "confluent_avro(value, schemaJson) - decode a Confluent-framed Avro binary value"),
      avroBuilder("confluent_avro", permissive = false)))
    ext.injectFunction((FunctionIdentifier("try_confluent_avro"),
      info("try_confluent_avro",
        "try_confluent_avro(value, schemaJson) - like confluent_avro but corrupt records decode to NULL"),
      avroBuilder("try_confluent_avro", permissive = true)))

    def intArg(name: String, e: Expression): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name width must be an integer literal, got $other")
    }
    ext.injectFunction((FunctionIdentifier("md5_shingles"),
      info("md5_shingles",
        "md5_shingles(tokens, n) - distinct word n-gram shingles as md5 hex array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "md5_shingles(tokens, n) takes two arguments")
        Md5Shingles(args(0), intArg("md5_shingles", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("word_shingle_set"),
      info("word_shingle_set",
        "word_shingle_set(tokens, n) - distinct word n-gram shingles (unhashed)"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "word_shingle_set(tokens, n) takes two arguments")
        WordShingleSet(args(0), intArg("word_shingle_set", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("char_grams_md5"),
      info("char_grams_md5",
        "char_grams_md5(text, k) - md5 hex array of char k-grams in position order"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "char_grams_md5(text, k) takes two arguments")
        CharGramsMd5(args(0), intArg("char_grams_md5", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("simhash_bits"),
      info("simhash_bits",
        "simhash_bits(tokens, bits) - whole-document simhash value"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "simhash_bits(tokens, bits) takes two arguments")
        SimhashBits(args(0), intArg("simhash_bits", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - intersection size of two sorted string arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count(a, b) takes two arguments")
        SortedIntersectCount(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("pos_char_grams"),
      info("pos_char_grams",
        "pos_char_grams(text, k) - generator: one (pos, gram) row per positional char k-gram"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "pos_char_grams(text, k) takes two arguments")
        PosCharGrams(args(0), intArg("pos_char_grams", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(str) - Unicode canonical composition (NFC)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(str) takes one argument")
        NfcNormalize(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("sliding_mins"),
      info("sliding_mins",
        "sliding_mins(a, w) - minimum of each w-wide sliding window over a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sliding_mins(a, w) takes two arguments")
        SlidingMins(args(0), intArg("sliding_mins", args(1)))
      }))
    ext.injectFunction((FunctionIdentifier("winnowed_token_fingerprints"),
      info("winnowed_token_fingerprints",
        "winnowed_token_fingerprints(tokens, k, w) - winnow-selected rolling k-token window fingerprints"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "winnowed_token_fingerprints(tokens, k, w) takes three arguments")
        graft.functions.WinnowedTokenFingerprints(args(0),
          intArg("winnowed_token_fingerprints", args(1)),
          intArg("winnowed_token_fingerprints", args(2)))
      }))
    ext.injectFunction((FunctionIdentifier("jpeg_sof_dims"),
      info("jpeg_sof_dims",
        "jpeg_sof_dims(payload) - struct(width, height) from a JPEG's SOF header, NULL if absent/corrupt"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "jpeg_sof_dims(payload) takes one argument")
        JpegSofDims(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity (0.7 boost threshold, prefix cap 4, empty -> 0)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaro_winkler(a, b) takes two arguments")
        graft.functions.JaroWinkler(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("tiff_dims"),
      info("tiff_dims",
        "tiff_dims(payload) - struct(width, height, bigendian) from a TIFF's first IFD, NULL if corrupt"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "tiff_dims(payload) takes one argument")
        graft.functions.TiffDims(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("hilbert_xy"),
      info("hilbert_xy",
        "hilbert_xy(x, y, bits) - position of (x, y) on the order-`bits` Hilbert curve (layout key)"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "hilbert_xy(x, y, bits) takes three arguments")
        graft.functions.HilbertIndex(args(0), args(1),
          intArg("hilbert_xy", args(2)))
      }))
    ext.injectFunction((FunctionIdentifier("zip_info"),
      info("zip_info",
        "zip_info(payload) - struct(n_entries, comp_bytes, first_name) from a ZIP central directory, NULL if corrupt"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "zip_info(payload) takes one argument")
        graft.functions.ZipInfo(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("mp3_info"),
      info("mp3_info",
        "mp3_info(payload) - struct(n_frames, bitrate_kbps, sample_rate, duration_ms) from a CBR MPEG-1 L3 stream, NULL if corrupt"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "mp3_info(payload) takes one argument")
        graft.functions.Mp3Info(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("webp_dims"),
      info("webp_dims",
        "webp_dims(payload) - struct(format, width, height) from a RIFF/WEBP container (VP8 lossy or VP8L lossless), NULL if corrupt"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "webp_dims(payload) takes one argument")
        graft.functions.WebpDims(args(0))
      }))
  }
}
