package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Round-10 curation additions: tokenizer fertility by language,
  * split-to-split contamination containment, and length-matched
  * importance resampling — the three audits a corpus release runs after
  * dedup/quality gating and before mixture planning.
  */
object TextOps11 {

  import TextOps7.{BpeTrainRounds, US}

  /** Tokenizer FERTILITY by language — the fairness number a
    * multilingual tokenizer owner tracks (Ács 2019; XLM-R §5): the
    * trained BPE (q169's merge table, via the shared training chain)
    * segments every corpus word, and per lang the audit reports
    * tokens/word, chars/token, and RELATIVE fertility vs the whole
    * corpus (>1 = this language pays more tokens per word than average,
    * i.e. its context windows hold less text). Relative fertility is
    * computed by exact cross-multiplication — (n_tok·gw)/(n_words·gt)
    * as decimal products divided once — so no ratio-of-rounded-doubles
    * drift exists between engines.
    *
    * Scale shape: training is vocab-sized (q169's analysis); serving is
    * ONE word-keyed broadcast join of the exploded corpus against the
    * vocab-sized segmentation table + one lang-keyed agg — exactly the
    * q175 plan with lang instead of source, plus a 5-row grid pass. */
  val q359_tokenizer_fertility = Q(
    "q359_tokenizer_fertility",
    Some(s"""${TextOps7.bpeTrainSqlChain},
            |tok AS (
            |  SELECT w, CAST(len(string_split(trim(s, chr(31)),
            |    chr(31)||chr(31))) AS BIGINT) AS n_tok
            |  FROM r$BpeTrainRounds),
            |dw AS (
            |  SELECT lang, unnest(string_split(text, ' ')) AS w
            |  FROM documents),
            |j AS (
            |  SELECT lang, dw.w, n_tok FROM dw JOIN tok USING (w)
            |  WHERE len(dw.w) > 0),
            |per AS (
            |  SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
            |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
            |    CAST(sum(len(w)) AS BIGINT) AS n_chars
            |  FROM j GROUP BY lang),
            |g AS (
            |  SELECT CAST(sum(n_words) AS BIGINT) AS gw,
            |    CAST(sum(n_tokens) AS BIGINT) AS gt
            |  FROM per)
            |SELECT lang, n_words, n_tokens,
            |  round(CAST(n_tokens AS DOUBLE) / n_words, 6) AS tokens_per_word,
            |  round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token,
            |  round(CAST(CAST(n_tokens AS HUGEINT) * gw AS DOUBLE)
            |    / CAST(CAST(n_words AS HUGEINT) * gt AS DOUBLE), 6)
            |    AS rel_fertility
            |FROM per CROSS JOIN g ORDER BY lang""".stripMargin),
    (s, d) => {
      val (_, trained) = TextOps7.trainBpe(s, d)
      val tok = trained.select(col("w"),
        size(expr(s"split(trim(BOTH '$US' FROM s), '$US$US')"))
          .cast("long").as("n_tok"))
      val dw = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
      // persisted: the lang grid feeds both the output rows and the
      // corpus-total aggregation
      val per = graft.operators.PlanCache.persist(
        dw.join(broadcast(tok), "w")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"),
            sum(length(col("w")).cast("long")).as("n_chars")))
      val g = per.agg(sum("n_words").cast("long").as("gw"),
        sum("n_tokens").cast("long").as("gt"))
      def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
      per.crossJoin(broadcast(g))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("n_words"), 6)
            .as("tokens_per_word"),
          round(col("n_chars").cast("double") / col("n_tokens"), 6)
            .as("chars_per_token"),
          round((d19(col("n_tokens")) * d19(col("gw"))).cast("double")
            / (d19(col("n_words")) * d19(col("gt"))).cast("double"), 6)
            .as("rel_fertility"))
        .orderBy("lang")
    })

  /** Split-to-split CONTAMINATION matrix — the leakage audit a release
    * runs AFTER splitting (q60) and dedup: for every ordered pair of
    * splits (train/val/test by the md5 doc draw), the containment
    * |shingles(A) ∩ shingles(B)| / |shingles(A)| over DISTINCT 5-token
    * shingles. q84 checks the corpus against an external benchmark;
    * this closes the loop INTERNALLY — val/test rows contaminated by
    * train (or each other) are exactly what makes eval numbers lie.
    *
    * Scale shape: one scan-side digest pass (native Md5Shingles) to the
    * DISTINCT (split, shingle) table, then a shingle-keyed self-join —
    * per-shingle fanout is at most 3×3 (splits, a constant), so the
    * join volume is ≤ 9·|distinct shingles|; only 32-char md5s travel,
    * and nothing doc×doc ever forms. */
  val q360_split_contamination = Q(
    "q360_split_contamination", {
      import TextFunctions.hexSpanValSql
      val f = s"${hexSpanValSql("md5(CAST(doc_id AS VARCHAR))", 0, 2)} % 10"
      Some(s"""WITH docs AS (
              |  SELECT CASE WHEN $f < 8 THEN 'train'
              |              WHEN $f = 8 THEN 'val' ELSE 'test' END AS sp,
              |    string_split(text, ' ') AS ts
              |  FROM documents),
              |sh AS (
              |  SELECT DISTINCT sp, unnest(list_transform(
              |    generate_series(1, greatest(len(ts) - 4, 0)),
              |    i -> md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
              |      || ' ' || ts[i+3] || ' ' || ts[i+4]))) AS h
              |  FROM docs),
              |sz AS (SELECT sp, CAST(count(*) AS BIGINT) AS n
              |       FROM sh GROUP BY sp),
              |inter AS (
              |  SELECT a.sp AS split_a, b.sp AS split_b,
              |    CAST(count(*) AS BIGINT) AS n_shared
              |  FROM sh a JOIN sh b USING (h)
              |  GROUP BY 1, 2)
              |SELECT split_a, split_b, n_shared, z.n AS size_a,
              |  round(CAST(n_shared AS DOUBLE) / z.n, 6) AS containment
              |FROM inter JOIN sz z ON z.sp = split_a
              |ORDER BY split_a, split_b""".stripMargin)
    },
    (s, d) => {
      import TextFunctions.{md5Shingles, tokens}
      val f = TextFunctions.hexSpanVal(col("__h"), 0, 2) % 10
      val sp = when(f < 8, "train").when(f === 8, "val").otherwise("test")
      // persisted: the distinct (split, shingle) table feeds the size
      // agg and both sides of the containment self-join
      val sh = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .withColumn("__h", md5(col("doc_id").cast("string")))
        .select(sp.as("sp"),
          explode(md5Shingles(tokens(col("text")), 5)).as("h"))
        .distinct())
      val sz = sh.groupBy("sp").agg(count(lit(1)).as("n"))
      sh.select(col("sp").as("split_a"), col("h"))
        .join(sh.select(col("sp").as("split_b"), col("h")), Seq("h"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sz.select(col("sp").as("split_a"),
          col("n").as("size_a"))), Seq("split_a"))
        .select(col("split_a"), col("split_b"), col("n_shared"),
          col("size_a"),
          round(col("n_shared").cast("double") / col("size_a"), 6)
            .as("containment"))
        .orderBy("split_a", "split_b")
    })

  /** Length-matched IMPORTANCE RESAMPLING plan — distribution matching
    * (the DSIR/doremi-adjacent device on the cheapest feature): train's
    * length-bucket distribution is reweighted to match val's, so a
    * filter that skewed train short (or long) stops biasing every
    * downstream curve. Per bucket: w_b = (t_b/N_t)/(s_b/N_s), computed
    * by exact cross-multiplication; buckets absent from val get w = 0
    * (dropped mass), and the plan's health metric is the effective
    * sample size of the reweighted train set, ESS = T′²/Σ(t_b²/s_b)
    * (algebraically exact for piecewise-constant weights — per-bucket
    * terms round at 9 and decimal-sum, the one-rounding discipline).
    * A low ESS says the match is too aggressive to resample at all.
    *
    * Scale shape: one corpus hash agg to the (split, bucket) grid;
    * every division happens on the bucket grid. */
  val q361_length_matched_resampling = Q(
    "q361_length_matched_resampling", {
      import TextFunctions.hexSpanValSql
      val f = s"${hexSpanValSql("md5(CAST(doc_id AS VARCHAR))", 0, 2)} % 10"
      Some(s"""WITH r AS (
              |  SELECT CASE WHEN $f < 8 THEN 'train'
              |              WHEN $f = 8 THEN 'val' ELSE 'test' END AS sp,
              |    CAST(n_chars // 100 AS BIGINT) AS bucket
              |  FROM documents),
              |grid AS (
              |  SELECT bucket,
              |    CAST(sum(CASE WHEN sp = 'train' THEN 1 ELSE 0 END)
              |      AS BIGINT) AS s_b,
              |    CAST(sum(CASE WHEN sp = 'val' THEN 1 ELSE 0 END)
              |      AS BIGINT) AS t_b
              |  FROM r GROUP BY bucket HAVING
              |    sum(CASE WHEN sp = 'train' THEN 1 ELSE 0 END) > 0),
              |tot AS (
              |  SELECT CAST(sum(s_b) AS BIGINT) AS ns,
              |    CAST(sum(t_b) AS BIGINT) AS nt FROM grid),
              |ess AS (
              |  SELECT round(CAST(sum(t_b) AS DOUBLE) * sum(t_b)
              |    / CAST(sum(CAST(round(CAST(t_b AS DOUBLE) * t_b / s_b, 9)
              |        AS DECIMAL(28,9))) AS DOUBLE), 6) AS ess
              |  FROM grid WHERE t_b > 0)
              |SELECT bucket, s_b AS n_train, t_b AS n_val,
              |  round(CAST(CAST(t_b AS HUGEINT) * ns AS DOUBLE)
              |    / CAST(CAST(s_b AS HUGEINT) * nt AS DOUBLE), 6) AS weight,
              |  e.ess
              |FROM grid CROSS JOIN tot CROSS JOIN ess e
              |ORDER BY bucket""".stripMargin)
    },
    (s, d) => {
      import TextFunctions.hexSpanValSql
      val f = expr(s"${hexSpanValSql("__h", 0, 2)} % 10")
      val sp = when(f < 8, "train").when(f === 8, "val").otherwise("test")
      // persisted: the bucket grid feeds totals, the ESS sum, and the
      // output rows
      val grid = graft.operators.PlanCache.persist(Tables.documents(s, d)
        .withColumn("__h", md5(col("doc_id").cast("string")))
        .select(sp.as("sp"), expr("n_chars div 100").as("bucket"))
        .groupBy("bucket")
        .agg(sum(when(col("sp") === "train", 1L).otherwise(0L)).as("s_b"),
          sum(when(col("sp") === "val", 1L).otherwise(0L)).as("t_b"))
        .filter(col("s_b") > 0))
      val tot = grid.agg(sum("s_b").cast("long").as("ns"),
        sum("t_b").cast("long").as("nt"))
      val essTerm = round(col("t_b").cast("double") * col("t_b")
        / col("s_b"), 9).cast("decimal(28,9)")
      val ess = grid.filter(col("t_b") > 0)
        .agg(round(sum("t_b").cast("double") * sum("t_b")
          / sum(essTerm).cast("double"), 6).as("ess"))
      def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
      grid.crossJoin(broadcast(tot)).crossJoin(broadcast(ess))
        .select(col("bucket"), col("s_b").as("n_train"),
          col("t_b").as("n_val"),
          round((d19(col("t_b")) * d19(col("ns"))).cast("double")
            / (d19(col("s_b")) * d19(col("nt"))).cast("double"), 6)
            .as("weight"),
          col("ess"))
        .orderBy("bucket")
    })

  /** Spell-variant matching with the FULL Damerau–Levenshtein distance
    * (native codegen'd expression, `functions.DamerauLevenshtein` —
    * Lowrance–Wagner, transpositions included, pinned to the oracle
    * engine's byte-level semantics) by construction-inversion: per part
    * a typo is formula-built from its name — adjacent transposition,
    * deletion, or substitution by `p_partkey % 3` at a key-derived
    * position — then (a) the (variant, dl, lev) grid pins the
    * distance semantics over 2 000 real strings (a transposition costs
    * 1 under DL but 2 under plain Levenshtein — the column pair is the
    * proof), and (b) each typo runs a BLOCKED dictionary match
    * (block = first byte + length ±1) counting candidates and dl ≤ 1
    * matches, with `n_blockmiss` counting the typos whose first-char
    * edit pushed the true name out of its own block — the classic
    * blocking-recall tradeoff, measured.
    *
    * Scale shape: typo synthesis and both distances are scan-side
    * codegen'd expressions; the dictionary (distinct names) is a
    * broadcast build side; the block join bounds candidate pairs to
    * (first byte × length band) cells — never an all-pairs product;
    * the final agg lands on a ≤ 3×3×3 grid. */
  val q370_damerau_match = Q(
    "q370_damerau_match",
    Some("""WITH p AS (
           |  SELECT p_partkey AS pk, p_name AS name,
           |    p_partkey % (length(p_name) - 1) + 1 AS pos,
           |    p_partkey % 3 AS variant
           |  FROM part),
           |t AS (
           |  SELECT pk, name, variant,
           |    CASE variant
           |      WHEN 0 THEN substr(name, 1, pos - 1)
           |        || substr(name, pos + 1, 1) || substr(name, pos, 1)
           |        || substr(name, pos + 2, 1000000)
           |      WHEN 1 THEN substr(name, 1, pos - 1)
           |        || substr(name, pos + 1, 1000000)
           |      ELSE substr(name, 1, pos - 1) || 'q'
           |        || substr(name, pos + 1, 1000000)
           |    END AS typo
           |  FROM p),
           |d AS (
           |  SELECT pk, name, variant, typo,
           |    CAST(damerau_levenshtein(name, typo) AS BIGINT) AS dl,
           |    CAST(levenshtein(name, typo) AS BIGINT) AS lev
           |  FROM t),
           |dict AS (SELECT DISTINCT p_name AS dname FROM part),
           |cand AS (
           |  SELECT d.pk, CAST(count(*) AS BIGINT) AS c_cand,
           |    CAST(sum(CASE WHEN damerau_levenshtein(d.typo, dict.dname)
           |      <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_match
           |  FROM d JOIN dict
           |    ON substr(d.typo, 1, 1) = substr(dict.dname, 1, 1)
           |   AND abs(length(d.typo) - length(dict.dname)) <= 1
           |  GROUP BY 1)
           |SELECT variant, dl, lev, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(coalesce(c_cand, 0)) AS BIGINT) AS n_cand,
           |  CAST(sum(coalesce(c_match, 0)) AS BIGINT) AS n_match,
           |  CAST(sum(CASE WHEN substr(typo, 1, 1) <> substr(name, 1, 1)
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_blockmiss
           |FROM d LEFT JOIN cand USING (pk)
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
    (s, d) => {
      val p = Tables.part(s, d).select(
        col("p_partkey").as("pk"), col("p_name").as("name"),
        (col("p_partkey") % (length(col("p_name")) - 1) + 1).as("pos"),
        (col("p_partkey") % 3).as("variant"))
      val t = p.select(col("pk"), col("name"), col("variant"),
        expr("""CASE variant
               |  WHEN 0 THEN substring(name, 1, pos - 1)
               |    || substring(name, pos + 1, 1) || substring(name, pos, 1)
               |    || substring(name, pos + 2, 1000000)
               |  WHEN 1 THEN substring(name, 1, pos - 1)
               |    || substring(name, pos + 1, 1000000)
               |  ELSE substring(name, 1, pos - 1) || 'q'
               |    || substring(name, pos + 1, 1000000)
               |END""".stripMargin).as("typo"))
      val dd = graft.operators.PlanCache.persist(t.select(
        col("pk"), col("name"), col("variant"), col("typo"),
        TextFunctions.damerauLevenshtein(col("name"), col("typo")).as("dl"),
        levenshtein(col("name"), col("typo")).cast("long").as("lev")))
      val dict = Tables.part(s, d).select(col("p_name").as("dname")).distinct()
      val cand = dd.join(broadcast(dict),
          substring(col("typo"), 1, 1) === substring(col("dname"), 1, 1) &&
            abs(length(col("typo")) - length(col("dname"))) <= 1)
        .groupBy("pk")
        .agg(count(lit(1)).as("c_cand"),
          sum(when(TextFunctions.damerauLevenshtein(
            col("typo"), col("dname")) <= 1, 1L).otherwise(0L))
            .as("c_match"))
      dd.join(cand, Seq("pk"), "left")
        .groupBy("variant", "dl", "lev")
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("c_cand"), lit(0L))).as("n_cand"),
          sum(coalesce(col("c_match"), lit(0L))).as("n_match"),
          sum(when(substring(col("typo"), 1, 1) =!=
            substring(col("name"), 1, 1), 1L).otherwise(0L))
            .as("n_blockmiss"))
        .orderBy("variant", "dl", "lev")
    })

  /** SORTED-NEIGHBORHOOD dedup (Hernández–Stolfo) — the third blocking
    * strategy in the family, beside LSH banding (q36) and key blocking
    * (q370): records sort by a normalized key (text lowercased,
    * space-stripped, first 16 chars) and each record is compared only
    * to its w−1 successors in sort order, so candidate pairs are
    * O(n·w) regardless of duplicate-cluster shape. Pairs come from
    * `lead()` at offsets 1–3 inside 2-char key-prefix blocks (the
    * blocked-SNM variant: the window never spans the corpus, so no
    * global single-partition sort exists — the repo's window
    * discipline), exact shingle Jaccard scores each pair, and the
    * report grids by offset: nearer neighbors in sort order should
    * carry higher mean similarity — the monotone decay IS the evidence
    * the sort key clusters duplicates.
    *
    * Scale shape: one scan builds (key, shingle set); the only shuffle
    * is the block-keyed sort; pairs = 3n rows; per-pair Jaccard rounds
    * at 6 and sums in decimal, so the offset means are partial-agg-
    * order-proof. */
  val q374_sorted_neighborhood = Q(
    "q374_sorted_neighborhood",
    Some("""WITH sh AS (
           |  SELECT doc_id,
           |    substr(replace(lower(text), ' ', ''), 1, 16) AS k,
           |    list_distinct(list_transform(
           |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
           |      i -> string_split(text, ' ')[i] || ' '
           |        || string_split(text, ' ')[i+1] || ' '
           |        || string_split(text, ' ')[i+2])) AS sset
           |  FROM documents),
           |w AS (
           |  SELECT doc_id, sset,
           |    lead(sset, 1) OVER win AS s1,
           |    lead(sset, 2) OVER win AS s2,
           |    lead(sset, 3) OVER win AS s3
           |  FROM sh
           |  WINDOW win AS (PARTITION BY substr(k, 1, 2)
           |    ORDER BY k, doc_id)),
           |pairs AS (
           |  SELECT 1 AS off, sset AS sa, s1 AS sb FROM w WHERE s1 IS NOT NULL
           |  UNION ALL SELECT 2, sset, s2 FROM w WHERE s2 IS NOT NULL
           |  UNION ALL SELECT 3, sset, s3 FROM w WHERE s3 IS NOT NULL),
           |j AS (
           |  SELECT off, coalesce(
           |    CAST(len(list_filter(sa, x -> list_contains(sb, x))) AS DOUBLE)
           |      / nullif(len(sa) + len(sb)
           |        - len(list_filter(sa, x -> list_contains(sb, x))), 0),
           |    0) AS jac
           |  FROM pairs)
           |SELECT off, CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(CASE WHEN jac >= 0.3 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dups,
           |  round(CAST(sum(CAST(round(jac, 6) AS DECIMAL(12,6)))
           |    AS DOUBLE) / count(*), 6) AS mean_jac
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.{shingles, tokens}
      val sh = Tables.documents(s, d).select(col("doc_id"),
        expr("substr(replace(lower(text), ' ', ''), 1, 16)").as("k"),
        graft.functions.TextFunctions.shingleSet(tokens(col("text"))).as("sset"))
      val win = Window.partitionBy(substring(col("k"), 1, 2))
        .orderBy("k", "doc_id")
      val w = sh.select(col("doc_id"), col("sset"),
        lead(col("sset"), 1).over(win).as("s1"),
        lead(col("sset"), 2).over(win).as("s2"),
        lead(col("sset"), 3).over(win).as("s3"))
      val pairs = w.select(explode(array(
          struct(lit(1).as("off"), col("sset").as("sa"), col("s1").as("sb")),
          struct(lit(2).as("off"), col("sset").as("sa"), col("s2").as("sb")),
          struct(lit(3).as("off"), col("sset").as("sa"), col("s3").as("sb"))))
          .as("p"))
        .select(col("p.off").as("off"), col("p.sa").as("sa"),
          col("p.sb").as("sb"))
        .filter(col("sb").isNotNull)
      val inter = size(array_intersect(col("sa"), col("sb")))
      val uni = size(col("sa")) + size(col("sb")) - inter
      val jac = when(uni === 0, lit(0.0))
        .otherwise(inter.cast("double") / uni)
      pairs.select(col("off"), jac.as("jac"))
        .groupBy("off")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("jac") >= 0.3, 1L).otherwise(0L)).as("n_dups"),
          round(sum(round(col("jac"), 6).cast("decimal(12,6)"))
            .cast("double") / count(lit(1)), 6).as("mean_jac"))
        .orderBy("off")
    })

  val all: Seq[Q] = Seq(q359_tokenizer_fertility, q360_split_contamination,
    q361_length_matched_resampling, q370_damerau_match,
    q374_sorted_neighborhood)
}
