package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text dedup/quality, part 5: edit-distance near-dup under blocking,
  * the prefix-filtered set-similarity join (PPJoin's candidate rule),
  * and two repetition/diversity quality signals (duplicate n-gram
  * fraction, token entropy).
  */
object TextOps5 {

  private val LevPrefix = 32 // chars compared
  private val LevMax = 8     // max edit distance reported

  /** Blocked edit-distance near-dup: candidate pairs share a (lang,
    * length-bucket) block, then exact levenshtein over the first 32 chars
    * ≤ 8 survives. Blocking keeps the pair space quadratic only within a
    * block (the standard record-linkage shape — at 100 TB the block key
    * is the shuffle key and no cross-block pair is ever materialized).
    * levenshtein() has identical semantics in both engines. */
  val q106_lev_neardup = Q(
    "q106_lev_neardup",
    Some(s"""WITH blk AS (
            |  SELECT doc_id, lang, n_chars // 16 AS lb,
            |    substr(text, 1, $LevPrefix) AS head
            |  FROM documents)
            |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
            |  CAST(levenshtein(x.head, y.head) AS BIGINT) AS lev
            |FROM blk x JOIN blk y
            |  ON x.lang = y.lang AND x.lb = y.lb AND x.doc_id < y.doc_id
            |WHERE levenshtein(x.head, y.head) <= $LevMax
            |ORDER BY doc_a, doc_b""".stripMargin),
    (s, d) => {
      // spread by the BLOCK key: the per-pair levenshtein work downstream
      // of the join runs in this partitioning (one parquet file would
      // otherwise serialize the whole O(block²) verify on one core); at
      // cluster scale this exchange IS the blocked join's shuffle (r16)
      val b = graft.operators.Spread.byKeys(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr("n_chars div 16").as("lb"),
          substring(col("text"), 1, LevPrefix).as("head")), "lang", "lb")
      val a2 = b.toDF("doc_b", "lang", "lb", "head_b")
      b.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("head", "head_a")
        .join(a2, Seq("lang", "lb"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("lev", levenshtein(col("head_a"), col("head_b")).cast("long"))
        .filter(col("lev") <= LevMax)
        .select("doc_a", "doc_b", "lev")
        .orderBy("doc_a", "doc_b")
    })

  private val JacT = 0.5
  private val JacN = 3 // word n-gram order of the shingle sets

  /** Prefix-filtered set-similarity self-join (PPJoin's candidate rule)
    * over 3-gram shingle sets (token sets are too coarse on same-vocab
    * corpora — shingles carry order, exactly as q36's MinHash): order
    * each document's md5'd shingles by ascending global document
    * frequency, keep only the first |s| − ⌈t·|s|⌉ + 1 as its "prefix";
    * two sets with Jaccard ≥ t MUST share a prefix element (pigeonhole
    * over the shared global order), so the inverted index over prefixes
    * alone generates every candidate — unlike LSH this is EXACT, and the
    * ORACLE IS THE BRUTE FORCE (full inverted index over every shingle),
    * so the hash match proves the filter loses nothing. At 100 TB the
    * prefix index is a fraction of the full index (rarest-first ⇒ tiny
    * postings lists), fixed-width md5s travel instead of raw text, and
    * the verify intersect is the codegen'd two-pointer kernel. */
  val q107_prefix_jaccard_join = Q(
    "q107_prefix_jaccard_join",
    Some(s"""WITH toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            |t AS (
            |  SELECT doc_id, md5(unnest(list_distinct(list_transform(
            |    range(1, greatest(len(ts) - ${JacN - 2}, 1)),
            |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])))) AS h
            |  FROM toks),
            |n AS (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id),
            |p AS (
            |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            |  FROM t a JOIN t b ON a.h = b.h AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
            |  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
            |  round(n_common / (na.n + nb.n - n_common), 6) AS jaccard
            |FROM p
            |JOIN n na ON na.doc_id = doc_a
            |JOIN n nb ON nb.doc_id = doc_b
            |WHERE n_common / (na.n + nb.n - n_common) >= $JacT
            |ORDER BY doc_a, doc_b""".stripMargin),
    (s, d) => {
      import graft.functions.TextFunctions
      // parallelism aid for the shingle-hash stage (see operators/Spread)
      val spread = graft.operators.Spread.byKey(Tables.documents(s, d), "doc_id")
      // persisted: the set frame feeds the prefix index AND both verify
      // sides — without it the shingle hashing re-executes per branch
      val sets = graft.operators.PlanCache.persist(spread
        .select(col("doc_id"),
          TextFunctions.md5Shingles(split(col("text"), " "), JacN).as("hs"))
        .filter(size(col("hs")) > 0)
        .withColumn("sh", sort_array(col("hs")))
        .select(col("doc_id"), col("sh"), size(col("sh")).as("n")))
      // Global order = lexicographic md5: the prefix theorem needs only a
      // SHARED total order, and the sets are already md5-sorted for the
      // two-pointer verify — so the prefix is a scan-side slice, zero
      // extra shuffles. (Classic PPJoin orders rarest-first to shrink
      // postings lists; that is a performance heuristic for df-skewed
      // shingle distributions — it costs a df aggregation + join + per-doc
      // re-sort, which measured 2-3× the whole query here, where near-all
      // shingles have df 1. On a df-skewed corpus, plug the df order back
      // in ahead of the slice.)
      val idx = sets
        .select(col("doc_id"), explode(expr(
          s"slice(sh, 1, size(sh) - CAST(ceil($JacT * size(sh)) AS INT) + 1)"))
          .as("h"))
      val cand = idx.toDF("doc_a", "h")
        .join(idx.toDF("doc_b", "h"), "h")
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
      val a = sets.toDF("doc_a", "sh_a", "n_a")
      val b = sets.toDF("doc_b", "sh_b", "n_b")
      // NOTE on the persist: this builder returns a LAZY frame, so the
      // cached set frame cannot be released here — it is registered with
      // operators.PlanCache; the harness clearCache()s between entries
      // and library callers use PlanCache.releaseAll() after
      // materializing (the iterative operators/ API unpersists
      // internally, e.g. Graph.pageRank, Dedup.connectedComponents).
      cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("n_common",
          TextFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")).cast("long"))
        .withColumn("jaccard",
          round(col("n_common") / (col("n_a") + col("n_b") - col("n_common")), 6))
        .filter(col("n_common") / (col("n_a") + col("n_b") - col("n_common")) >= JacT)
        .select(col("doc_a"), col("doc_b"), col("n_common"),
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
          col("jaccard"))
        .orderBy("doc_a", "doc_b")
    })

  private val RepN = 3

  /** Repetition quality signals (the Gopher-style repetition rules): per
    * document, the fraction of word 3-grams that are duplicates of an
    * earlier occurrence, and the mass of the single most frequent token
    * (deterministic argmax: count desc, token asc). The n-gram fraction
    * is pure scan-side array arithmetic (zero shuffle); the top token is
    * one (doc, tok) hash agg + one tiny per-doc window. */
  val q108_repeated_ngrams = Q(
    "q108_repeated_ngrams",
    Some(s"""WITH toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            |g AS (
            |  SELECT doc_id,
            |    greatest(len(ts) - $RepN + 1, 0) AS n_grams,
            |    len(list_distinct(list_transform(
            |      range(1, greatest(len(ts) - $RepN + 2, 1)),
            |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS n_distinct
            |  FROM toks),
            |tc AS (
            |  SELECT doc_id, tok, count(*) AS c FROM (
            |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
            |  GROUP BY doc_id, tok),
            |top AS (
            |  SELECT doc_id, tok AS top_tok, c AS top_n FROM (
            |    SELECT doc_id, tok, c,
            |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
            |    FROM tc) r WHERE rn = 1),
            |nt AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
            |  FROM documents)
            |SELECT g.doc_id, CAST(g.n_grams AS BIGINT) AS n_grams,
            |  CAST(g.n_distinct AS BIGINT) AS n_distinct,
            |  round(CASE WHEN g.n_grams > 0
            |    THEN 1.0 - n_distinct / g.n_grams ELSE 0.0 END, 6) AS dup_gram_frac,
            |  top.top_tok, CAST(top.top_n AS BIGINT) AS top_n,
            |  round(top.top_n / nt.n_toks, 6) AS top_tok_frac
            |FROM g JOIN top ON top.doc_id = g.doc_id
            |JOIN nt ON nt.doc_id = g.doc_id
            |ORDER BY g.doc_id""".stripMargin),
    (s, d) => {
      import graft.functions.TextFunctions
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
      val g = docs.select(col("doc_id"),
        greatest(size(col("ts")) - (RepN - 1), lit(0)).cast("long").as("n_grams"),
        size(TextFunctions.shingleSet(col("ts"), RepN))
          .cast("long").as("n_distinct"),
        size(col("ts")).cast("long").as("n_toks"))
      val tc = docs.select(col("doc_id"), explode(col("ts")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("doc_id").orderBy(col("c").desc, col("tok"))
      val top = tc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("tok").as("top_tok"), col("c").as("top_n"))
      g.join(top, "doc_id")
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          round(when(col("n_grams") > 0,
            lit(1.0) - col("n_distinct") / col("n_grams")).otherwise(0.0), 6)
            .as("dup_gram_frac"),
          col("top_tok"), col("top_n"),
          round(col("top_n") / col("n_toks"), 6).as("top_tok_frac"))
        .orderBy("doc_id")
    })

  /** Token-distribution entropy per document (diversity score): H =
    * −Σ p·log2 p over the token frequencies. Per-term contributions are
    * rounded to 9 decimals and summed in DECIMAL — the round-then-
    * exact-sum trick (as q89) that makes a double-valued reduction
    * independent of aggregation order on any cluster. One (doc, tok)
    * hash agg, then one doc-keyed agg. */
  val q109_token_entropy = Q(
    "q109_token_entropy",
    Some("""WITH tc AS (
            |  SELECT doc_id, tok, count(*) AS c FROM (
            |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
            |  GROUP BY doc_id, tok),
            |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY doc_id)
            |SELECT tc.doc_id, n.n AS n_toks,
            |  CAST(count(*) AS BIGINT) AS n_distinct,
            |  round(CAST(sum(CAST(round(-(c / n.n) * log2(c / n.n), 9)
            |    AS DECIMAL(18,9))) AS DOUBLE), 6) AS entropy
            |FROM tc JOIN n ON n.doc_id = tc.doc_id
            |GROUP BY tc.doc_id, n.n
            |ORDER BY tc.doc_id""".stripMargin),
    (s, d) => {
      val tc = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("doc_id")
      tc.withColumn("n", sum(col("c")).over(w))
        .groupBy(col("doc_id"), col("n").cast("long").as("n_toks"))
        .agg(count(lit(1)).as("n_distinct"),
          round(expr("""CAST(sum(CAST(round(-(c / n) * log2(c / n), 9)
            AS DECIMAL(18,9))) AS DOUBLE)"""), 6).as("entropy"))
        .select("doc_id", "n_toks", "n_distinct", "entropy")
        .orderBy("doc_id")
    })

  private val ContT = 0.8

  /** DIRECTIONAL containment join (Broder's containment, the dedup gap
    * symmetric Jaccard misses): C(A→B) = |A∩B| / |A| ≥ $ContT flags A as
    * mostly CONTAINED in B — a quote, excerpt, or true subset whose
    * Jaccard stays low when B is much larger. Candidates come from the
    * one-sided prefix theorem: if |A∩B| ≥ t·|A|, at most |A|−⌈t·|A|⌉
    * elements of A miss B, so A's first |A|−⌈t·|A|⌉+1 shingles (shared
    * md5 order) must hit B's FULL inverted index — the contained side
    * gets q107's tiny prefix treatment, the containing side keeps full
    * postings (the standard containment-index asymmetry). Verify is the
    * same codegen'd two-pointer intersect; the ORACLE IS THE BRUTE
    * FORCE, so the hash match proves the one-sided filter loses
    * nothing. */
  val q168_containment = Q(
    "q168_containment",
    Some(s"""WITH toks AS (
            |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            |t AS (
            |  SELECT doc_id, md5(unnest(list_distinct(list_transform(
            |    range(1, greatest(len(ts) - ${JacN - 2}, 1)),
            |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])))) AS h
            |  FROM toks),
            |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY doc_id),
            |p AS (
            |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |    CAST(count(*) AS BIGINT) AS n_common
            |  FROM t a JOIN t b ON a.h = b.h AND a.doc_id <> b.doc_id
            |  GROUP BY 1, 2)
            |SELECT doc_a, doc_b, n_common, na.n AS n_a, nb.n AS n_b,
            |  round(n_common / na.n, 6) AS containment
            |FROM p
            |JOIN n na ON na.doc_id = doc_a
            |JOIN n nb ON nb.doc_id = doc_b
            |WHERE n_common >= $ContT * na.n
            |ORDER BY doc_a, doc_b""".stripMargin),
    (s, d) => {
      import graft.functions.TextFunctions
      val spread = graft.operators.Spread.byKey(Tables.documents(s, d), "doc_id")
      // persisted via PlanCache (released by releaseAll()/clearCache()):
      // the set frame feeds the two index branches and both verify sides
      val sets = graft.operators.PlanCache.persist(spread
        .select(col("doc_id"),
          TextFunctions.md5Shingles(split(col("text"), " "), JacN).as("hs"))
        .filter(size(col("hs")) > 0)
        .select(col("doc_id"), sort_array(col("hs")).as("sh"),
          size(col("hs")).cast("long").as("n")))
      // contained side: prefix slice only; containing side: FULL postings
      val prefixIdx = sets
        .select(col("doc_id").as("doc_a"), explode(expr(
          s"slice(sh, 1, size(sh) - CAST(ceil($ContT * size(sh)) AS INT) + 1)"))
          .as("h"))
      val fullIdx = sets
        .select(col("doc_id").as("doc_b"), explode(col("sh")).as("h"))
      val cand = prefixIdx.join(fullIdx, "h")
        .filter(col("doc_a") =!= col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val a = sets.toDF("doc_a", "sh_a", "n_a")
      val b = sets.toDF("doc_b", "sh_b", "n_b")
      cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("n_common",
          TextFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")).cast("long"))
        .filter(col("n_common") >= lit(ContT) * col("n_a"))
        .select(col("doc_a"), col("doc_b"), col("n_common"),
          col("n_a"), col("n_b"),
          round(col("n_common") / col("n_a"), 6).as("containment"))
        .orderBy("doc_a", "doc_b")
    })

  val all: Seq[Q] = Seq(q106_lev_neardup, q107_prefix_jaccard_join,
    q108_repeated_ngrams, q109_token_entropy, q168_containment)
}
