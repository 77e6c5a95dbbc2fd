package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Text analysis, part 6: collocation mining (PMI bigrams) and tokenizer
  * vocabulary coverage — the corpus-statistics pair a tokenizer/training
  * pipeline runs before committing to a vocab.
  */
object TextOps6 {

  private val PmiMinPair = 5L
  private val PmiTopK = 20

  /** PMI collocations: pointwise mutual information of adjacent word
    * pairs, ln(P(ab) / (P(a)·P(b))) over exact corpus counts. All inputs
    * to the double expression are exact integers and the expression tree
    * is written identically on both engines (left-associated products,
    * one ln, one round) — the q89 round-at-the-end discipline. Corpus
    * totals travel as a broadcast 1-row frame (the q66 TF-IDF pattern);
    * the bigram and unigram counts are two hash aggs keyed on the word —
    * nothing wider than a (w1,w2) pair ever shuffles, and the top-k is a
    * TakeOrdered, not a global sort. */
  val q134_pmi_bigrams = Q(
    "q134_pmi_bigrams",
    Some(s"""WITH toks AS (
            |  SELECT string_split(text, ' ') AS ts FROM documents),
            |tot AS (
            |  SELECT CAST(sum(len(ts)) AS BIGINT) AS nu,
            |    CAST(sum(greatest(len(ts) - 1, 0)) AS BIGINT) AS nb
            |  FROM toks),
            |uni AS (
            |  SELECT w, CAST(count(*) AS BIGINT) AS n_w
            |  FROM (SELECT unnest(ts) AS w FROM toks) t GROUP BY w),
            |big AS (
            |  SELECT b[1] AS w1, b[2] AS w2, CAST(count(*) AS BIGINT) AS n_ab
            |  FROM (SELECT unnest(list_transform(range(1, len(ts)),
            |                 i -> [ts[i], ts[i+1]])) AS b
            |        FROM toks) t
            |  GROUP BY 1, 2)
            |SELECT w1, w2, n_ab, ua.n_w AS n_a, ub.n_w AS n_b,
            |  round(ln((CAST(n_ab AS DOUBLE) * nu * nu)
            |    / (CAST(nb AS DOUBLE) * ua.n_w * ub.n_w)), 6) AS pmi
            |FROM big
            |JOIN uni ua ON ua.w = w1
            |JOIN uni ub ON ub.w = w2
            |CROSS JOIN tot
            |WHERE n_ab >= $PmiMinPair
            |ORDER BY pmi DESC, w1, w2
            |LIMIT $PmiTopK""".stripMargin),
    (s, d) => {
      val toks = Tables.documents(s, d).select(split(col("text"), " ").as("ts"))
      val tot = toks.agg(
        sum(size(col("ts"))).cast("long").as("nu"),
        sum(greatest(size(col("ts")) - 1, lit(0))).cast("long").as("nb"))
      val uni = toks.select(explode(col("ts")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n_w"))
      val big = toks
        .select(explode(expr(
          "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1)," +
            " i -> array(element_at(ts, i), element_at(ts, i + 1)))" +
            " ELSE array() END")).as("b"))
        .select(element_at(col("b"), 1).as("w1"),
          element_at(col("b"), 2).as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= PmiMinPair)
      big
        .join(uni.toDF("w1", "n_a"), "w1")
        .join(uni.toDF("w2", "n_b"), "w2")
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
          round(log(
            (col("n_ab").cast("double") * col("nu") * col("nu")) /
              (col("nb").cast("double") * col("n_a") * col("n_b"))), 6)
            .as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(PmiTopK)
    })

  private val VocabSize = 500

  /** Tokenizer vocabulary coverage: the top-V corpus tokens by frequency
    * (ties to the lexicographically smaller token, so the V-boundary is
    * deterministic on both engines) and, per language, the fraction of
    * token OCCURRENCES the vocab covers — the decision table for sizing
    * a vocab before training. The vocab is a global TakeOrdered (V rows,
    * never a full sort) and re-enters as a broadcast semi-join, so the
    * corpus token stream is scanned twice and shuffled only for the two
    * (word / lang) hash aggs. */
  val q135_vocab_coverage = Q(
    "q135_vocab_coverage",
    Some(s"""WITH tok AS (
            |  SELECT lang, unnest(string_split(text, ' ')) AS w
            |  FROM documents),
            |uni AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
            |vocab AS (SELECT w FROM uni ORDER BY n DESC, w LIMIT $VocabSize),
            |tot AS (
            |  SELECT lang, CAST(count(*) AS BIGINT) AS total_tokens
            |  FROM tok GROUP BY lang),
            |cov AS (
            |  SELECT lang, CAST(count(*) AS BIGINT) AS covered_tokens
            |  FROM tok WHERE w IN (SELECT w FROM vocab) GROUP BY lang)
            |SELECT t.lang, t.total_tokens,
            |  coalesce(c.covered_tokens, 0) AS covered_tokens,
            |  round(CAST(coalesce(c.covered_tokens, 0) AS DOUBLE)
            |    / CAST(t.total_tokens AS DOUBLE), 6) AS coverage
            |FROM tot t LEFT JOIN cov c ON c.lang = t.lang
            |ORDER BY t.lang""".stripMargin),
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      val vocab = tok.groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(VocabSize)
        .select("w")
      val tot = tok.groupBy("lang").agg(count(lit(1)).as("total_tokens"))
      val cov = tok.join(broadcast(vocab), Seq("w"), "left_semi")
        .groupBy("lang").agg(count(lit(1)).as("covered_tokens"))
      tot.join(cov.toDF("lang", "cov_n"), Seq("lang"), "left")
        .select(col("lang"), col("total_tokens"),
          coalesce(col("cov_n"), lit(0L)).as("covered_tokens"),
          round(coalesce(col("cov_n"), lit(0L)).cast("double") /
            col("total_tokens").cast("double"), 6).as("coverage"))
        .orderBy("lang")
    })

  private val DhBlocks = 49 // 49 block digests -> 48 comparison bits
  private val DhBits = DhBlocks - 1
  private val DhBands = 3 // 3 x 16-bit LSH bands
  // Verified radius == the band scheme's pigeonhole guarantee: hamming <= 2
  // (fewer differing bits than bands) forces a shared 16-bit band, so the
  // result is EXACTLY the set of pairs within radius 2 — no silent recall
  // gap. A radius-6 guarantee would need 7 bands of ceil(48/7) bits, and
  // 7-bit bands have 128 distinct values: in-bucket candidate volume grows
  // ~N²/128 per band, which does not survive a large corpus. Pairs beyond
  // radius 2 that happen to share a band are deliberately excluded rather
  // than reported as if recall were complete.
  private val DhMaxHamming = DhBands - 1

  /** Blockwise perceptual fingerprint (dHash): the image dHash scheme —
    * resize to a fixed grid, hash each cell, emit one bit per ADJACENT
    * CELL COMPARISON — applied to a document's fixed 49-block character
    * grid (on images the cells are stub-decoded pixel intensities; the
    * grid arithmetic is identical). Same-shape near-duplicates differ in
    * few cells, so their 48-bit fingerprints sit at small hamming
    * distance; candidate pairs come from 3×16-bit LSH bands and are
    * verified with the exact bit_count(xor) at radius DhMaxHamming = 2 —
    * the bands' pigeonhole guarantee, so recall within the reported
    * radius is exact (see the constant's comment for why a wider radius
    * is not worth the band-selectivity collapse). Fingerprints are one
    * scan-side expression
    * chain (49 md5s/doc, fused in ONE transform so codegen sees an array
    * fold, not 49 inlined digests); only 8-byte hashes and 2-byte bands
    * ever shuffle. */
  /** The q137 fingerprint stage, exposed for the recall spec (which
    * brute-forces all-pairs hamming against it): (doc_id, 48-bit hash).
    * Persisted via PlanCache — the band frame self-joins and the
    * fingerprint column is referenced by every band lambda; without the
    * cut, CollapseProject inlines the whole 49-digest fold into each
    * reference on both join sides (the q36 signature-stage rule).
    * Released by releaseAll()/clearCache(). */
  private[graft] def dhashFingerprints(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    // native BlockDHash (late r13): the composed 49-digest transform +
    // comparison fold ran as interpreted higher-order lambdas per row
    // (the q374 class); the native expression does one code-point walk
    // + one digest instance. The composed form stays the definition and
    // the oracle's formulation — parity property-asserted in
    // TextExpressionsSpec incl. multibyte/astral text.
    graft.operators.PlanCache.persist(docs
      .select(col("doc_id"),
        graft.functions.TextFunctions
          .blockDHash(col("text"), DhBlocks, DhBits).as("hash")))

  val q137_block_dhash = Q(
    "q137_block_dhash", {
      val vExpr = graft.functions.TextFunctions.hexSpanValSql("m", 0, 8)
      Some(s"""WITH g AS (
              |  SELECT doc_id,
              |    list_transform(range(0, $DhBlocks), i -> md5(substr(text,
              |      1 + i * greatest(1, CAST(ceil(length(text) / $DhBlocks.0)
              |        AS INT)),
              |      greatest(1, CAST(ceil(length(text) / $DhBlocks.0) AS INT)))))
              |      AS hs
              |  FROM documents),
              |v AS (
              |  SELECT doc_id, i,
              |    ${vExpr.replace("substr(m", "substr(hs[i+1]")} AS v,
              |    ${vExpr.replace("substr(m", "substr(hs[i+2]")} AS vn
              |  FROM g, unnest(range(0, $DhBits)) AS u(i)),
              |h AS (
              |  SELECT doc_id,
              |    CAST(sum(CASE WHEN v < vn THEN (CAST(1 AS BIGINT) << i)
              |             ELSE 0 END) AS BIGINT) AS hash
              |  FROM v GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, hash, j, (hash >> (16 * j)) & 65535 AS band
              |  FROM h, unnest(range(0, $DhBands)) AS u(j)),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM bands a JOIN bands b
              |    ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id)
              |SELECT doc_a, doc_b,
              |  CAST(bit_count(xor(ha.hash, hb.hash)) AS BIGINT) AS hamming
              |FROM cand
              |JOIN h ha ON ha.doc_id = doc_a
              |JOIN h hb ON hb.doc_id = doc_b
              |WHERE bit_count(xor(ha.hash, hb.hash)) <= $DhMaxHamming
              |ORDER BY doc_a, doc_b""".stripMargin)
    },
    (s, d) => {
      val withVs = dhashFingerprints(Tables.documents(s, d))
      val bands = withVs.select(col("doc_id"), col("hash"),
          explode(expr(s"transform(sequence(0, ${DhBands - 1}), " +
            "j -> struct(j AS j, shiftright(hash, 16 * j) & 65535 AS band))")).as("jb"))
        .select(col("doc_id"), col("hash"),
          col("jb.j").as("j"), col("jb.band").as("band"))
      val cand = bands.toDF("doc_a", "ha", "j", "band")
        .join(bands.toDF("doc_b", "hb", "j", "band"), Seq("j", "band"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
      cand
        .withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("hamming") <= DhMaxHamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    })

  private val SpanC = 4 // tokens per span (the corpus has no line breaks)

  /** C4-style cross-corpus span deduplication: segment every document
    * into non-overlapping $SpanC-token spans, keep only each distinct
    * span's CANONICAL occurrence (first by (doc_id, position) — C4 keeps
    * one copy of any repeated three-sentence span; spans stand in for
    * sentences since the synthetic corpus is single-line), and reassemble
    * the surviving spans in order. Returns the cleaned text plus
    * kept/dropped span counts per document.
    *
    * Scale shape: span extraction is scan-side (the token array is
    * sliced, never exploded to single tokens); the canonical-occurrence
    * decision is ONE window keyed on the span hash — the global span
    * table every corpus-wide dedup variant needs — and reassembly is one
    * doc-keyed aggregation. Nothing is all-pairs and no driver state
    * exists at any scale. */
  val q149_span_dedup = Q(
    "q149_span_dedup",
    Some(s"""WITH toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            |chunks AS (
            |  SELECT doc_id, i AS pos,
            |    array_to_string(ts[(i*$SpanC+1):(i*$SpanC+$SpanC)], ' ') AS chunk
            |  FROM toks, unnest(range(0, CAST(ceil(len(ts) / $SpanC.0) AS INT))) t(i)),
            |ranked AS (
            |  SELECT doc_id, pos, chunk, ROW_NUMBER() OVER (
            |    PARTITION BY chunk ORDER BY doc_id, pos) AS rn
            |  FROM chunks),
            |kept AS (SELECT doc_id, pos, chunk FROM ranked WHERE rn = 1),
            |agg AS (
            |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
            |    string_agg(chunk, ' ' ORDER BY pos) AS clean_text
            |  FROM kept GROUP BY doc_id),
            |nch AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
            |  FROM chunks GROUP BY doc_id)
            |SELECT nch.doc_id, coalesce(clean_text, '') AS clean_text,
            |  coalesce(n_kept, 0) AS n_kept,
            |  nch.n_chunks - coalesce(n_kept, 0) AS n_dropped
            |FROM nch LEFT JOIN agg ON nch.doc_id = agg.doc_id
            |ORDER BY nch.doc_id""".stripMargin),
    (s, d) => {
      // ts is referenced twice (span lambda + count) — CollapseProject
      // keeps non-cheap multi-referenced aliases in their own project,
      // so the split runs once per row, not once per span
      val withTs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      val chunks = withTs
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), ceil(size(col("ts")) / lit(SpanC.toDouble)).cast("int") - 1),
          i => array_join(slice(col("ts"), i * SpanC + 1, lit(SpanC)), " ")))
          .as(Seq("pos", "chunk")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("chunk").orderBy("doc_id", "pos")
      val kept = chunks.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      val agg = kept.groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("chunk")))),
          p => p("chunk")), " ").as("clean_text"))
      // per-doc span count is scan-side arithmetic (== the explode's
      // cardinality by construction) — no second explode+aggregation
      val nch = withTs.select(col("doc_id"),
        ceil(size(col("ts")) / lit(SpanC.toDouble)).cast("long").as("n_chunks"))
      nch.join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
        .orderBy("doc_id")
    })

  /** Vocabulary growth curve (the Heaps'-law diagnostic a tokenizer team
    * reads before sizing a vocab): each term's FIRST document (min
    * doc_id), then the running vocabulary size over the document order —
    * one row per document that introduces new vocabulary. Two hash aggs
    * (term → first doc, first doc → new-term count); the corpus token
    * stream itself is touched once.
    *
    * Scale shape (caught by the r11 catalog-wide window sweep): with
    * real heavy-tailed text nearly EVERY doc introduces some rare
    * token, so the introducing-doc frame is doc-scale and the previous
    * single cumulative window over it was the q280 scale-killer. The
    * running sum is now the q280 TWO-PHASE device: 256 doc_id RANGE
    * buckets (width ⌈(max_id+1)/256⌉, so bucket order ≡ doc_id order),
    * per-bucket totals prefix-summed on the 256-row grid and broadcast
    * back as offsets, then a bucket-PARTITIONED cumulative window —
    * bit-identical to the oracle's global cumsum, no single-partition
    * row-scale sort anywhere. */
  val q159_vocab_growth = Q(
    "q159_vocab_growth",
    Some("""WITH tok AS (
            |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
            |  FROM documents),
            |first AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY term),
            |intro AS (SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS new_terms
            |  FROM first GROUP BY fd)
            |SELECT doc_id, new_terms,
            |  CAST(sum(new_terms) OVER (ORDER BY doc_id) AS BIGINT) AS cum_vocab
            |FROM intro
            |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val first = tok.groupBy("term").agg(min(col("doc_id")).as("fd"))
      val intro = graft.operators.PlanCache.persist(
        first.groupBy(col("fd").as("doc_id"))
          .agg(count(lit(1)).as("new_terms")))
      // order-preserving 256-way range bucketing on doc_id
      val wdt = intro.agg(
        ceil((max("doc_id") + 1) / 256.0).cast("long").as("wdt"))
      val bucketed = intro.crossJoin(broadcast(wdt))
        .withColumn("bucket",
          floor(col("doc_id").cast("double") / col("wdt")).cast("long"))
      val wOff = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bucketed.groupBy("bucket")
        .agg(sum("new_terms").as("bsum"))
        .withColumn("off", coalesce(sum("bsum").over(wOff), lit(0L)))
        .select("bucket", "off")
      val wIn = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      bucketed.join(broadcast(offsets), Seq("bucket"))
        .withColumn("cum_vocab",
          (col("off") + sum("new_terms").over(wIn)).cast("long"))
        .select("doc_id", "new_terms", "cum_vocab")
        .orderBy("doc_id")
    })

  private val ZipfTopN = 20

  /** Zipf rank-frequency fit (corpus-health check: natural corpora run
    * slope ≈ −1; synthetic/templated ones flatten): least-squares slope
    * and intercept of ln(freq) on ln(rank) over the top-N tokens. The
    * moments follow q97's exact discipline — each ln term is rounded
    * once, summed in exact decimal, and the closed-form slope runs the
    * identical IEEE expression tree on both engines. One corpus hash agg
    * + a TakeOrdered top-N; the regression sees N rows. */
  val q160_zipf_fit = Q(
    "q160_zipf_fit",
    Some(s"""WITH tf AS (
            |  SELECT term, CAST(count(*) AS BIGINT) AS f
            |  FROM (SELECT unnest(string_split(text, ' ')) AS term
            |        FROM documents) t
            |  GROUP BY term),
            |top AS (
            |  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS rk
            |  FROM tf ORDER BY f DESC, term LIMIT $ZipfTopN),
            |m AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n,
            |    CAST(sum(CAST(round(ln(rk), 8) AS DECIMAL(20,8))) AS DOUBLE) AS sx,
            |    CAST(sum(CAST(round(ln(f), 8) AS DECIMAL(20,8))) AS DOUBLE) AS sy,
            |    CAST(sum(CAST(round(ln(rk) * ln(f), 8) AS DECIMAL(20,8))) AS DOUBLE) AS sxy,
            |    CAST(sum(CAST(round(ln(rk) * ln(rk), 8) AS DECIMAL(20,8))) AS DOUBLE) AS sxx
            |  FROM top)
            |SELECT n,
            |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
            |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
            |    AS intercept
            |FROM m""".stripMargin),
    (s, d) => {
      val tf = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("f"))
      val top = tf.orderBy(col("f").desc, col("term")).limit(ZipfTopN)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("f").desc, col("term"))))
      def dsum(c: org.apache.spark.sql.Column) =
        sum(round(c, 8).cast("decimal(20,8)")).cast("double")
      val lrk = log(col("rk").cast("double"))
      val lf = log(col("f").cast("double"))
      val m = top.agg(count(lit(1)).as("n"), dsum(lrk).as("sx"),
        dsum(lf).as("sy"), dsum(lrk * lf).as("sxy"), dsum(lrk * lrk).as("sxx"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      m.select(col("n"), round(slope, 6).as("slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"))
    })

  // ordered BPE merge table (applied highest-priority first, the BPE
  // inference rule); pairs chosen from the corpus vocabulary
  private val BpeMerges = Seq(
    ("t a", "ta"), ("ta b", "tab"), ("r o", "ro"), ("ro w", "row"),
    ("k e", "ke"))

  /** BPE merge APPLICATION (the inference half of the tokenizer story —
    * q58 counts regex tokens, q135 sizes a vocab; this applies a FIXED
    * ordered merge table the way a trained BPE tokenizer does): each
    * word becomes its space-joined character sequence, each merge
    * rewrites every occurrence of its pair in priority order, and the
    * word's token count is what remains. Pure scan-side string work per
    * document — the merge table is a compile-time constant exactly like
    * a deployed tokenizer's, so 100 TB costs one corpus pass and the
    * per-source report is one hash agg. */
  val q161_bpe_apply = Q(
    "q161_bpe_apply", {
      def merged(cs: String) = BpeMerges.foldLeft(cs) {
        case (acc, (a, b)) => s"replace($acc, '$a', '$b')" }
      val perTok = merged("list_aggregate(string_split(t, ''), 'string_agg', ' ')")
      Some(s"""SELECT source,
              |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
              |  CAST(sum(list_sum(list_transform(string_split(text, ' '),
              |    t -> len(string_split($perTok, ' '))))) AS BIGINT)
              |    AS n_bpe_tokens
              |FROM documents
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    },
    (s, d) => {
      def merged(cs: String) = BpeMerges.foldLeft(cs) {
        case (acc, (a, b)) => s"replace($acc, '$a', '$b')" }
      // Spark's split('', -1) keeps a trailing empty element — trim the
      // trailing space it would leave in the char-joined form
      val perTok = merged("trim(array_join(split(t, ''), ' '))")
      Tables.documents(s, d)
        .groupBy("source")
        .agg(
          sum(size(split(col("text"), " ")).cast("long")).as("n_words"),
          sum(expr(
            s"aggregate(transform(split(text, ' '), t -> size(split($perTok, ' '))), 0, (a, x) -> a + x)")
            .cast("long")).as("n_bpe_tokens"))
        .orderBy("source")
    })

  val all: Seq[Q] = Seq(q134_pmi_bigrams, q135_vocab_coverage,
    q137_block_dhash, q149_span_dedup, q159_vocab_growth, q160_zipf_fit,
    q161_bpe_apply)
}
