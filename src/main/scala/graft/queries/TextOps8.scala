package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Text ops, part 8: ingest-time text canonicalization (Unicode NFC via
  * the native expression) and the named quality-rule gate (the
  * Gopher/Dolma-style document filter re-expressed as exact integer
  * predicates).
  */
object TextOps8 {

  /** Combining acute accent / diaeresis — appended to ASCII corpus text
    * to CONSTRUCT decomposed input deterministically (the q173
    * construction-inversion device: both engines build the identical
    * decomposed string, so the normalizer's fold is the thing the hash
    * checks). */
  private val Acute = "\u0301"
  private val Umlaut = "\u0308"

  /** Unicode NFC normalization at ingest: the same visible text can
    * arrive composed (U+00E9) or decomposed (e + U+0301), and every
    * downstream fingerprint — exact-dedup md5, MinHash shingles, group
    * keys — silently splits such documents unless the corpus is
    * canonicalized first. The corpus is ASCII, so each doc is decorated
    * with deterministically constructed decomposed sequences
    * (e+COMBINING ACUTE, o+COMBINING DIAERESIS); the native
    * `NfcNormalize` expression must fold them to the composed forms
    * DuckDB's nfc_normalize produces, character counts shrinking by
    * exactly the combining marks folded.
    *
    * Scale shape: pure scan-side expression (inside whole-stage codegen,
    * with an isNormalized short-circuit for the all-ASCII common case) +
    * one source-keyed hash agg. */
  val q186_nfc_normalize = Q(
    "q186_nfc_normalize",
    Some(s"""WITH deco AS (
            |  SELECT source,
            |    substr(text, 1, 24) || 'e' || chr(769) || 'o' || chr(776)
            |      AS raw
            |  FROM documents),
            |n AS (SELECT source, raw, nfc_normalize(raw) AS norm FROM deco)
            |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            |  CAST(sum(len(raw)) AS BIGINT) AS raw_chars,
            |  CAST(sum(len(norm)) AS BIGINT) AS norm_chars,
            |  CAST(sum(CASE WHEN norm <> raw THEN 1 ELSE 0 END) AS BIGINT)
            |    AS n_changed,
            |  min(norm) AS sample_norm
            |FROM n GROUP BY source ORDER BY source""".stripMargin),
    (s, d) => {
      import graft.functions.TextFunctions.nfc
      val raw = concat(substring(col("text"), 1, 24),
        lit("e" + Acute + "o" + Umlaut))
      Tables.documents(s, d)
        .select(col("source"), raw.as("raw"))
        .withColumn("norm", nfc(col("raw")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("raw"))).as("raw_chars"),
          sum(length(col("norm"))).as("norm_chars"),
          sum(when(col("norm") =!= col("raw"), 1L).otherwise(0L))
            .as("n_changed"),
          min(col("norm")).as("sample_norm"))
        .orderBy("source")
    })

  /** The NAMED quality-rule gate (Gopher/Dolma-style document filter,
    * Rae et al. 2021 §A1.2): per-document boolean rules aggregated to a
    * per-source scorecard. Rules are re-expressed as EXACT integer
    * predicates so both engines decide every boundary document
    * identically (no double-division at a threshold):
    *   - r_len     : 50 <= words <= 100000
    *   - r_mwl     : mean word length in [3, 10]  ⇔  3·words <= letters <= 10·words
    *   - r_ttr     : distinct-word ratio >= 0.4   ⇔  5·distinct >= 2·words
    *   - r_wordlen : longest token <= 30 chars
    *
    * Scale shape: all four rules are scan-side string arithmetic; the
    * only shuffle is the source-keyed scorecard agg. */
  val q187_quality_gate = Q(
    "q187_quality_gate",
    Some("""WITH m AS (
           |  SELECT source,
           |    len(text) - len(replace(text, ' ', '')) + 1 AS words,
           |    len(replace(text, ' ', '')) AS letters,
           |    len(list_distinct(string_split(text, ' '))) AS dwords,
           |    list_max(list_transform(string_split(text, ' '),
           |      w -> len(w))) AS maxw
           |  FROM documents),
           |r AS (
           |  SELECT source,
           |    CASE WHEN words >= 50 AND words <= 100000 THEN 1 ELSE 0 END AS r_len,
           |    CASE WHEN letters >= 3 * words AND letters <= 10 * words
           |         THEN 1 ELSE 0 END AS r_mwl,
           |    CASE WHEN 5 * dwords >= 2 * words THEN 1 ELSE 0 END AS r_ttr,
           |    CASE WHEN maxw <= 30 THEN 1 ELSE 0 END AS r_wordlen
           |  FROM m)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(r_len) AS BIGINT) AS pass_len,
           |  CAST(sum(r_mwl) AS BIGINT) AS pass_mwl,
           |  CAST(sum(r_ttr) AS BIGINT) AS pass_ttr,
           |  CAST(sum(r_wordlen) AS BIGINT) AS pass_wordlen,
           |  CAST(sum(r_len * r_mwl * r_ttr * r_wordlen) AS BIGINT)
           |    AS pass_all
           |FROM r GROUP BY source ORDER BY source""".stripMargin),
    (s, d) => {
      val toks = split(col("text"), " ")
      val words = length(col("text")) -
        length(translate(col("text"), " ", "")) + lit(1)
      val letters = length(translate(col("text"), " ", ""))
      val dwords = size(array_distinct(toks))
      val maxw = array_max(transform(toks, w => length(w)))
      val rLen = when(words >= 50 && words <= 100000, 1L).otherwise(0L)
      val rMwl = when(letters >= words * 3 && letters <= words * 10, 1L)
        .otherwise(0L)
      val rTtr = when(dwords * 5 >= words * 2, 1L).otherwise(0L)
      val rWordlen = when(maxw <= 30, 1L).otherwise(0L)
      Tables.documents(s, d)
        .select(col("source"), rLen.as("r_len"), rMwl.as("r_mwl"),
          rTtr.as("r_ttr"), rWordlen.as("r_wordlen"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("r_len")).as("pass_len"),
          sum(col("r_mwl")).as("pass_mwl"),
          sum(col("r_ttr")).as("pass_ttr"),
          sum(col("r_wordlen")).as("pass_wordlen"),
          sum(col("r_len") * col("r_mwl") * col("r_ttr") * col("r_wordlen"))
            .as("pass_all"))
        .orderBy("source")
    })

  /** CANONICAL-DEDUP UPLIFT: how many MORE duplicate documents exact
    * dedup finds once the corpus is canonicalized (NFC + casefold +
    * whitespace collapse) — the report that justifies a normalization
    * stage in front of q34's exact pass. Variant copies are CONSTRUCTED
    * deterministically for doc_id % 7 = 3 (leading/doubled spaces,
    * upper-cased ASCII, decomposed accent where the original carries the
    * composed form), so raw byte-equality misses every variant while
    * canonical equality folds each onto its original.
    *
    * Scale shape: both dup passes group on md5 of the key — only 32-char
    * digests shuffle, never document text; two hash aggs + a per-source
    * 1-row join. */
  val q191_canonical_uplift = Q(
    "q191_canonical_uplift", {
      val composed = "chr(233)"        // é U+00E9
      val decomposed = "'e' || chr(769)" // e + COMBINING ACUTE
      Some(s"""WITH corpus AS (
              |  SELECT source, text || ' ' || $composed AS t FROM documents
              |  UNION ALL
              |  SELECT source, '  ' || upper(text) || '  ' || $decomposed
              |  FROM documents WHERE doc_id % 7 = 3),
              |keyed AS (
              |  SELECT source, md5(t) AS rk,
              |    md5(nfc_normalize(lower(trim(regexp_replace(t, ' +', ' ', 'g')))))
              |      AS ck
              |  FROM corpus),
              |raw AS (
              |  SELECT source, CAST(sum(c - 1) AS BIGINT) AS raw_dup_docs
              |  FROM (SELECT source, rk, count(*) AS c FROM keyed
              |        GROUP BY source, rk) GROUP BY source),
              |can AS (
              |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
              |    CAST(sum(c - 1) AS BIGINT) AS canon_dup_docs
              |  FROM (SELECT source, ck, count(*) AS c FROM keyed
              |        GROUP BY source, ck)
              |  GROUP BY source)
              |SELECT can.source, n_docs, raw_dup_docs, canon_dup_docs,
              |  canon_dup_docs - raw_dup_docs AS uplift
              |FROM can JOIN raw ON can.source = raw.source
              |ORDER BY can.source""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.nfc
      val docs = Tables.documents(s, d)
      val corpus = docs
        .select(col("source"),
          concat(col("text"), lit(" \u00e9")).as("t"))
        .unionAll(docs.filter(col("doc_id") % 7 === 3)
          .select(col("source"),
            concat(lit("  "), upper(col("text")), lit("  e" + Acute))
              .as("t")))
      val keyed = corpus.select(col("source"), md5(col("t")).as("rk"),
        md5(nfc(lower(trim(regexp_replace(col("t"), " +", " ")))))
          .as("ck"))
      val raw = keyed.groupBy("source", "rk").count()
        .groupBy("source")
        .agg(sum(col("count") - 1).as("raw_dup_docs"))
      val can = keyed.groupBy("source", "ck").count()
        .groupBy("source")
        .agg(sum(col("count")).as("n_docs"),
          sum(col("count") - 1).as("canon_dup_docs"))
      can.join(raw, "source")
        .select(col("source"), col("n_docs"), col("raw_dup_docs"),
          col("canon_dup_docs"),
          (col("canon_dup_docs") - col("raw_dup_docs")).as("uplift"))
        .orderBy("source")
    })

  /** MOJIBAKE detection and repair: text that went UTF-8 → latin-1 →
    * UTF-8 arrives with 'é' as 'Ã©' and 'ï' as 'Ã¯' — the classic
    * double-encoding corruption every web-scraped corpus carries. A
    * hash-selected fifth of the corpus is CONSTRUCTED corrupted (the
    * same suffix every clean doc gets, but through the latin-1 round
    * trip); the detector (the 'Ã' signature byte), the replace-chain
    * repair, and the repaired-equals-clean proof are what the hash
    * checks.
    *
    * Scale shape: detection and repair are scan-side string ops; one
    * source-keyed scorecard agg. */
  val q192_mojibake = Q(
    "q192_mojibake", {
      val moji = "' caf' || chr(195) || chr(169) || ' na' || chr(195) || chr(175) || 've'"
      val clean = "' caf' || chr(233) || ' na' || chr(239) || 've'"
      Some(s"""WITH c AS (
              |  SELECT source,
              |    substr(text, 1, 40) ||
              |      CASE WHEN doc_id % 5 = 2 THEN $moji ELSE $clean END AS raw,
              |    substr(text, 1, 40) || $clean AS want
              |  FROM documents),
              |r AS (
              |  SELECT source, raw, want,
              |    CASE WHEN contains(raw, chr(195)) THEN 1 ELSE 0 END AS flagged,
              |    replace(replace(raw, chr(195) || chr(169), chr(233)),
              |            chr(195) || chr(175), chr(239)) AS repaired
              |  FROM c)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(flagged) AS BIGINT) AS n_flagged,
              |  CAST(sum(CASE WHEN flagged = 1 AND repaired = want
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired,
              |  CAST(sum(CASE WHEN flagged = 1
              |    THEN len(raw) - len(repaired) ELSE 0 END) AS BIGINT)
              |    AS chars_folded
              |FROM r GROUP BY source ORDER BY source""".stripMargin)
    },
    (s, d) => {
      val moji = " caf\u00c3\u00a9 na\u00c3\u00afve"
      val clean = " caf\u00e9 na\u00efve"
      val raw = concat(substring(col("text"), 1, 40),
        when(col("doc_id") % 5 === 2, lit(moji)).otherwise(lit(clean)))
      val want = concat(substring(col("text"), 1, 40), lit(clean))
      Tables.documents(s, d)
        .select(col("source"), raw.as("raw"), want.as("want"))
        .withColumn("flagged",
          when(col("raw").contains("\u00c3"), 1L).otherwise(0L))
        .withColumn("repaired",
          regexp_replace(regexp_replace(col("raw"),
            "\u00c3\u00a9", "\u00e9"), "\u00c3\u00af", "\u00ef"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("flagged")).as("n_flagged"),
          sum(when(col("flagged") === 1 && col("repaired") === col("want"),
            1L).otherwise(0L)).as("n_repaired"),
          sum(when(col("flagged") === 1,
            length(col("raw")) - length(col("repaired"))).otherwise(0L))
            .as("chars_folded"))
        .orderBy("source")
    })

  /** CORPUS DIVERSITY (distinct-n): per source, the fraction of unigram
    * and bigram occurrences that are distinct — the self-repetition
    * metric (distinct-1/distinct-2 of the text-generation literature)
    * that flags template-heavy or boilerplate sources before training.
    *
    * Scale shape: two explodes over the same scan, each into a
    * source-keyed agg whose exact distinct rides the standard Expand
    * plan; grams hash-agg by (source, gram) — nothing pairwise. At
    * extreme vocab the exact NDVs swap for the mergeable HLL family
    * (q164), same report schema. */
  val q196_distinct_ngrams = Q(
    "q196_distinct_ngrams",
    Some("""WITH toks AS (
           |  SELECT source, string_split(text, ' ') AS ts FROM documents),
           |uni AS (SELECT source, unnest(ts) AS w FROM toks),
           |big AS (
           |  SELECT source, unnest(list_transform(range(1, len(ts)),
           |    i -> ts[i] || ' ' || ts[i+1])) AS g
           |  FROM toks),
           |u AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS uni_total,
           |    CAST(count(DISTINCT w) AS BIGINT) AS uni_distinct
           |  FROM uni GROUP BY source),
           |b AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS bi_total,
           |    CAST(count(DISTINCT g) AS BIGINT) AS bi_distinct
           |  FROM big GROUP BY source)
           |SELECT u.source, uni_total, uni_distinct, bi_total, bi_distinct,
           |  round(CAST(uni_distinct AS DOUBLE) / uni_total, 6) AS distinct_1,
           |  round(CAST(bi_distinct AS DOUBLE) / bi_total, 6) AS distinct_2
           |FROM u JOIN b ON u.source = b.source
           |ORDER BY u.source""".stripMargin),
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), split(col("text"), " ").as("ts"))
      val uni = toks.select(col("source"), explode(col("ts")).as("w"))
        .groupBy("source")
        .agg(count(lit(1)).as("uni_total"),
          countDistinct(col("w")).as("uni_distinct"))
      val big = toks
        .select(col("source"), explode(
          graft.functions.TextFunctions.shingles(col("ts"), 2)).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as("bi_total"),
          countDistinct(col("g")).as("bi_distinct"))
      uni.join(big, "source")
        .select(col("source"), col("uni_total"), col("uni_distinct"),
          col("bi_total"), col("bi_distinct"),
          round(col("uni_distinct").cast("double") / col("uni_total"), 6)
            .as("distinct_1"),
          round(col("bi_distinct").cast("double") / col("bi_total"), 6)
            .as("distinct_2"))
        .orderBy("source")
    })

  /** LSH RECALL AUDIT: the QA gate a dedup pipeline owner runs before
    * trusting the banded MinHash pass — on a bounded probe subset
    * (doc_id < 300), compare the band-candidate pairs (threshold 0 keeps
    * every candidate, so the operator exposes its raw candidate set)
    * against brute-force exact Jaccard ≥ 0.15 ground truth. Reports
    * measured recall and verify efficiency; a recall drop after a
    * banding/k change flips the hash.
    *
    * Scale shape: the audited operator keeps its production plan (band
    * equi-join, length-ratio prefilter disabled at t=0, two-pointer
    * verify); the brute-force truth is deliberately bounded to the probe
    * subset, never the corpus (the q110 probe-cap rule). */
  val q198_lsh_recall = Q(
    "q198_lsh_recall", {
      import graft.functions.TextFunctions.minhashRotSql
      val K = 8
      val sigExprs = (0 until K)
        .map(i => minhashRotSql("hs", i) + s" AS sig_$i").mkString(",\n  ")
      val bandRows = (0 until K)
        .map(i => s"SELECT doc_id, $i AS band, sig_$i AS h FROM sig")
        .mkString("\n  UNION ALL ")
      Some(s"""WITH tok AS (
              |  SELECT doc_id, string_split(text, ' ') AS toks
              |  FROM documents WHERE doc_id < 300),
              |sh AS (
              |  SELECT doc_id, list_distinct(list_transform(
              |    generate_series(1, greatest(len(toks) - 2, 0)),
              |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              |    AS sset
              |  FROM tok),
              |hsh AS (
              |  SELECT doc_id, list_transform(sset, s -> md5(s)) AS hs
              |  FROM sh),
              |sig AS (
              |  SELECT doc_id,
              |  $sigExprs
              |  FROM hsh),
              |bands AS (
              |  $bandRows),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h
              |    AND a.doc_id < b.doc_id),
              |exact AS (
              |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
              |  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
              |  WHERE CAST(len(list_filter(x.sset, v -> list_contains(y.sset, v))) AS DOUBLE)
              |      / (len(x.sset) + len(y.sset)
              |         - len(list_filter(x.sset, v -> list_contains(y.sset, v)))) >= 0.15),
              |hit AS (
              |  SELECT e.doc_a FROM exact e
              |  JOIN cand c ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b)
              |SELECT
              |  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
              |  CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
              |  CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
              |  round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
              |    / (SELECT count(*) FROM exact), 6) AS recall,
              |  round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
              |    / (SELECT count(*) FROM cand), 6) AS verify_efficiency
              |""".stripMargin)
    },
    (s, d) => {
      import graft.functions.TextFunctions.{shingles, tokens}
      val subset = Tables.documents(s, d).filter(col("doc_id") < 300)
      // threshold 0 disables both the length-ratio prefilter and the
      // jaccard gate: the result is every distinct band-candidate pair
      // WITH its exact verified jaccard
      val cand = graft.operators.Dedup.minhashNearDupPairs(
        subset, "doc_id", "text", k = 8, shingleN = 3, threshold = 0.0)
      val sh = subset.select(col("doc_id"),
        graft.functions.TextFunctions.shingleSet(tokens(col("text"))).as("sset"))
      val x = sh.select(col("doc_id").as("doc_a"), col("sset").as("sa"))
      val y = sh.select(col("doc_id").as("doc_b"), col("sset").as("sb"))
      val inter = size(array_intersect(col("sa"), col("sb")))
      val jac = inter.cast("double") /
        (size(col("sa")) + size(col("sb")) - inter)
      val nExact = x.join(y, col("doc_a") < col("doc_b"))
        .filter(jac >= 0.15)
        .agg(count(lit(1)).as("n_exact"))
      val candStats = cand.agg(count(lit(1)).as("n_cand"),
        sum(when(col("jaccard") >= 0.15, 1L).otherwise(0L)).as("n_hit"))
      nExact.crossJoin(candStats)
        .select(col("n_exact"), col("n_cand"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_exact"), 6)
            .as("recall"),
          round(col("n_hit").cast("double") / col("n_cand"), 6)
            .as("verify_efficiency"))
    })

  /** Per-language top-5 char trigrams via the NATIVE GENERATOR
    * `pos_char_grams` (functions/PosCharGrams — the §2.9 UDTF tier):
    * rows stream out of the generator lazily (no per-document gram
    * array), aggregate on (lang, gram), and rank inside each language
    * on the tiny per-lang gram table. Char-n-gram profiles ARE the
    * classic language-ID model (q31's heuristic, made empirical). The
    * oracle replays the grams with generate_series + substring. */
  val q218_chargram_topk = Q(
    "q218_chargram_topk",
    Some("""WITH g AS (
           |  SELECT lang,
           |    unnest(list_transform(generate_series(1, len(text) - 2),
           |      i -> substring(text, i, 3))) AS gram
           |  FROM documents WHERE len(text) >= 3),
           |c AS (
           |  SELECT lang, gram, CAST(count(*) AS BIGINT) AS n
           |  FROM g GROUP BY 1, 2),
           |r AS (
           |  SELECT lang, gram, n, ROW_NUMBER() OVER (PARTITION BY lang
           |    ORDER BY n DESC, gram) AS rk
           |  FROM c)
           |SELECT lang, gram, n, CAST(rk AS BIGINT) AS rk
           |FROM r WHERE rk <= 5
           |ORDER BY lang, rk""".stripMargin),
    (s, d) => {
      import graft.functions.TextFunctions.posCharGrams
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n").desc, col("gram"))
      Tables.documents(s, d)
        .select(col("lang"), posCharGrams(col("text"), 3).as(Seq("pos", "gram")))
        .groupBy("lang", "gram").agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 5)
        .select("lang", "gram", "n", "rk")
        .orderBy("lang", "rk")
    })

  /** Flesch-reading-ease-style readability per source — the classic
    * quality-filter signal (C4/Gopher-style pipelines gate on exactly
    * such shallow linguistic ratios). Words = whitespace tokens,
    * sentences = [.!?]+ runs (min 1), syllables ≈ vowel-group count —
    * a deterministic, replayable approximation (real hyphenation needs
    * a dictionary; the RATIOS are what quality gates threshold). All
    * three counts are scan-side regex/split sizes; the per-doc score is
    * one double expression rounded to 4 decimals, aggregated in exact
    * decimal. One source-keyed hash agg — no window, no join. */
  val q221_readability = Q(
    "q221_readability",
    Some("""WITH s AS (
           |  SELECT source,
           |    round(206.835
           |      - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
           |          / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
           |      - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
           |          / len(string_split(text, ' '))), 4) AS rs
           |  FROM documents)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  round(CAST(sum(CAST(rs AS DECIMAL(18,4))) AS DOUBLE)
           |    / count(*), 6) AS mean_score,
           |  round(CAST(sum(CASE WHEN rs < 30 THEN 1 ELSE 0 END) AS DOUBLE)
           |    / count(*), 6) AS low_share
           |FROM s GROUP BY source ORDER BY source""".stripMargin),
    (s, d) => {
      val w = size(split(col("text"), " ")).cast("double")
      val sents = greatest(
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))),
        lit(1)).cast("double")
      val syl = size(
        regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
        .cast("double")
      val rs = round(lit(206.835) - lit(1.015) * (w / sents)
        - lit(84.6) * (syl / w), 4)
      Tables.documents(s, d)
        .select(col("source"), rs.as("rs"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("rs").cast("decimal(18,4)")).cast("double")
            / count(lit(1)), 6).as("mean_score"),
          round(sum(when(col("rs") < 30, 1).otherwise(0)).cast("double")
            / count(lit(1)), 6).as("low_share"))
        .orderBy("source")
    })

  private val SwChunk = 20 // tokens per language-ID chunk

  /** Code-switch audit: language ID at CHUNK granularity (q82's
    * non-overlapping token windows × q31's decision rule), then per-doc
    * consistency — majority language, distinct predicted languages, and
    * switch ratio (1 − majority share). A document whose chunks disagree
    * is mixed-language (or template-injected) content that a doc-level
    * language filter silently mislabels — the standard curation miss
    * this audit surfaces.
    *
    * Scale shape: chunking is a scan-side explode bounded by
    * tokens/chunk-size per doc; everything after is (doc, lang)-keyed
    * hash aggs plus one doc-keyed majority window on the chunk-count
    * grid — nothing corpus-pairwise, nothing collected. */
  val q229_code_switch = Q(
    "q229_code_switch",
    Some(s"""WITH tok AS (
            |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            |ch AS (
            |  SELECT doc_id,
            |    list_slice(t, (c - 1) * $SwChunk + 1,
            |      least(c * $SwChunk, len(t))) AS ctoks
            |  FROM tok, unnest(generate_series(1,
            |    CAST(ceil(len(t) / $SwChunk.0) AS BIGINT))) AS g(c)
            |  WHERE len(t) > 0),
            |pred AS (
            |  SELECT doc_id,
            |    CASE WHEN list_contains(ctoks, 'the') THEN 'en'
            |         WHEN list_contains(ctoks, 'data') THEN 'de'
            |         ELSE 'und' END AS plang
            |  FROM ch),
            |cnt AS (
            |  SELECT doc_id, plang, CAST(count(*) AS BIGINT) AS n
            |  FROM pred GROUP BY doc_id, plang),
            |tot AS (
            |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chunks,
            |    CAST(count(*) AS BIGINT) AS n_langs
            |  FROM cnt GROUP BY doc_id),
            |maj AS (
            |  SELECT doc_id, plang AS major_lang, n AS major_n FROM (
            |    SELECT doc_id, plang, n, ROW_NUMBER() OVER (
            |      PARTITION BY doc_id ORDER BY n DESC, plang) AS rn
            |    FROM cnt) x WHERE rn = 1)
            |SELECT t.doc_id, t.n_chunks, t.n_langs, m.major_lang,
            |  round(1 - CAST(m.major_n AS DOUBLE) / t.n_chunks, 6)
            |    AS switch_ratio
            |FROM tot t JOIN maj m USING (doc_id)
            |WHERE t.n_chunks >= 2 AND t.n_langs >= 2
            |ORDER BY switch_ratio DESC, doc_id""".stripMargin),
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) > 0)
      val pred = tok
        .select(col("doc_id"), explode(expr(
          s"sequence(bigint(1), cast(ceil(size(t) / $SwChunk.0) as bigint))"))
          .as("cidx"), col("t"))
        .select(col("doc_id"), expr(
          s"slice(t, cast((cidx - 1) * $SwChunk + 1 as int), $SwChunk)")
          .as("ctoks"))
        .select(col("doc_id"),
          when(array_contains(col("ctoks"), "the"), "en")
            .when(array_contains(col("ctoks"), "data"), "de")
            .otherwise("und").as("plang"))
      val cnt = pred.groupBy("doc_id", "plang").agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy("doc_id")
        .agg(sum(col("n")).as("n_chunks"), count(lit(1)).as("n_langs"))
      val wmaj = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("n").desc, col("plang"))
      val maj = cnt.withColumn("rn", row_number().over(wmaj))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("plang").as("major_lang"),
          col("n").as("major_n"))
      tot.join(maj, "doc_id")
        .filter(col("n_chunks") >= 2 && col("n_langs") >= 2)
        .select(col("doc_id"), col("n_chunks"), col("n_langs"),
          col("major_lang"),
          round(lit(1) - col("major_n").cast("double") / col("n_chunks"), 6)
            .as("switch_ratio"))
        .orderBy(col("switch_ratio").desc, col("doc_id"))
    })

  private val SubK = 50              // tokens per exact window
  private val SubW = 8               // winnowing selection window
  private val SubMinRun = SubK + SubW - 1 // guaranteed-detected run length

  /** EXACT long-substring cross-doc dedup at $SubK-token windows
    * (VERDICT r7 #6) — the training-data-dedup literature shape (Lee et
    * al.'s "Deduplicating Training Data" exact-substring pass): report
    * every document pair sharing an exact duplicated token run of
    * ≥ $SubMinRun tokens, with the pair's total shared-window count and
    * its longest run. q149 dedups 4-token spans; this is the
    * long-window variant whose index a winnowing selection bounds.
    *
    * Two passes, both scan-side until the joins:
    * 1) CANDIDATES — per doc, ONE native pass
    *    (WinnowedTokenFingerprints): O(tokens) rolling polynomial
    *    window hashes + winnow selection at window $SubW, no window
    *    string ever materialized. Selection keeps ~2/($SubW+1) of the
    *    window hashes, and the winnowing guarantee makes any shared
    *    run of ≥ $SubK+$SubW−1 tokens contribute a shared SELECTED
    *    fingerprint — so the fp-keyed equi-join yields a candidate
    *    superset of every reportable pair while the index stays
    *    sublinear in windows.
    * 2) VERIFY — re-derive full windows for candidate endpoints only
    *    (broadcast semi-join pushdown), equi-join on the chunk STRING
    *    (not the hash — collision-proof), then exact run lengths by
    *    gaps-and-islands per alignment diagonal (pa−pb). The windows
    *    here are bounded by candidate count, never the corpus.
    *
    * The oracle is the BRUTE-FORCE substring join (all windows, no
    * winnowing) + the same islands arithmetic — the final ≥ $SubMinRun
    * filter makes brute force and winnowed-candidates-then-verify
    * provably identical, which is exactly the equivalence the entry
    * exists to prove. Sub-guarantee runs ($SubK..${SubMinRun - 1}) are
    * excluded from BOTH sides by the filter.
    *
    * Skew governance at 100 TB: a fingerprint shared by d documents
    * contributes d² candidate rows, and web-scale corpora DO carry
    * ubiquitous 50-token boilerplate (licenses, navigation). The
    * production knob is q178's MOSS df-cap on the fp-keyed join —
    * dropping fingerprints with df > cap bounds every bucket at the
    * cost of narrowing the guarantee to non-boilerplate runs (text that
    * ubiquitous is itself a dedup target first). It is deliberately NOT
    * applied here because the cap acts on hash values the brute-force
    * oracle cannot replay, and this entry's purpose is the PROVABLE
    * equivalence; on this corpus max fp df is single-digit. */
  val q242_exact_substring_dedup = Q(
    "q242_exact_substring_dedup",
    Some(s"""WITH toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            |w AS (
            |  SELECT doc_id, i AS pos,
            |    array_to_string(ts[i:i+${SubK - 1}], ' ') AS chunk
            |  FROM toks, unnest(generate_series(1, len(ts) - ${SubK - 1})) t(i)
            |  WHERE len(ts) >= $SubK),
            |j AS (
            |  SELECT a.doc_id AS doc_a, a.pos AS pa,
            |    b.doc_id AS doc_b, b.pos AS pb
            |  FROM w a JOIN w b ON a.chunk = b.chunk AND a.doc_id < b.doc_id),
            |runs AS (
            |  SELECT doc_a, doc_b, pa - pb AS diff,
            |    pa - ROW_NUMBER() OVER (
            |      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS grp
            |  FROM j),
            |r2 AS (SELECT doc_a, doc_b, count(*) AS consec
            |       FROM runs GROUP BY doc_a, doc_b, diff, grp),
            |mr AS (SELECT doc_a, doc_b,
            |         CAST(max(consec) + ${SubK - 1} AS BIGINT) AS max_run
            |       FROM r2 GROUP BY 1, 2),
            |nw AS (SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_windows
            |       FROM j GROUP BY 1, 2)
            |SELECT mr.doc_a, mr.doc_b, nw.n_windows, mr.max_run
            |FROM mr JOIN nw ON nw.doc_a = mr.doc_a AND nw.doc_b = mr.doc_b
            |WHERE mr.max_run >= $SubMinRun
            |ORDER BY mr.doc_a, mr.doc_b""".stripMargin),
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .filter(size(col("ts")) >= SubK)
      // pass 1: winnowed fingerprint index → candidate pairs, via the
      // native WinnowedTokenFingerprints expression: O(tokens) rolling
      // polynomial window hashes + winnow selection in one pass, never
      // materializing a window string. The oracle never replays the
      // selection — it brute-forces all windows — so the fingerprint
      // hash only has to be deterministic, and a collision can only ADD
      // a candidate that exact verification discards.
      val fps = toks
        .select(col("doc_id"), explode(
          graft.functions.TextFunctions.winnowedTokenFingerprints(
            col("ts"), SubK, SubW)).as("fp"))
      val cand = fps.select(col("doc_id").as("doc_a"), col("fp"))
        .join(fps.select(col("doc_id").as("doc_b"), col("fp").as("fpb")),
          col("fp") === col("fpb") && col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
        .localCheckpoint(true) // tiny; read 3× below (both endpoints + join)
      // pass 2: exact verification bounded to candidate endpoints
      val w = toks.select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("ts")) - (SubK - 1)),
          i => array_join(slice(col("ts"), i, lit(SubK)), " ")))
          .as(Seq("p0", "chunk")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("chunk"))
      val wa = w.join(broadcast(cand.select(col("doc_a").as("doc_id")).distinct()),
          Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("doc_a"), col("pos").as("pa"), col("chunk"))
      val wb = w.join(broadcast(cand.select(col("doc_b").as("doc_id")).distinct()),
          Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("doc_b"), col("pos").as("pb"), col("chunk"))
      val j = cand.join(wa, Seq("doc_a")).join(wb, Seq("doc_b", "chunk"))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_a", "doc_b", "diff").orderBy("pa")
      val consec = j.withColumn("diff", col("pa") - col("pb"))
        .withColumn("grp", col("pa") - row_number().over(wr))
        .groupBy("doc_a", "doc_b", "diff", "grp")
        .agg(count(lit(1)).as("consec"))
      val mr = consec.groupBy("doc_a", "doc_b")
        .agg((max(col("consec")) + (SubK - 1)).cast("long").as("max_run"))
      val nw = j.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_windows"))
      mr.join(nw, Seq("doc_a", "doc_b"))
        .filter(col("max_run") >= SubMinRun)
        .select(col("doc_a"), col("doc_b"), col("n_windows"), col("max_run"))
        .orderBy("doc_a", "doc_b")
    })

  val all: Seq[Q] = Seq(q186_nfc_normalize, q187_quality_gate,
    q191_canonical_uplift, q192_mojibake, q196_distinct_ngrams,
    q198_lsh_recall, q218_chargram_topk, q221_readability, q229_code_switch,
    q242_exact_substring_dedup)
}
