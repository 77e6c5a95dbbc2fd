package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis + deduplication operators over the documents table
  * (SURVEY.md §2.11): token stats, quality scoring, language-ID heuristic,
  * term frequencies, fingerprinting, exact dedup, n-gram Jaccard pairs,
  * MinHash+LSH near-dup (full oracle!), simhash.
  */
object TextOps {

  /** Token counting per language (scan-side expressions + one hash agg). */
  val q29_token_stats = Q(
    "q29_token_stats",
    Some("""SELECT lang,
            |  count(*) AS n_docs,
            |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
            |  CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
            |  CAST(sum(n_chars) AS BIGINT) AS total_chars
            |FROM documents
            |GROUP BY lang
            |ORDER BY lang""".stripMargin),
    (s, d) => Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast("long")).as("total_tokens"),
        max(size(tokens(col("text"))).cast("long")).as("max_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang"))

  /** Per-document quality metrics: token counts, distinct ratio, average
    * token length, stopword ratio — integer-exact then double division
    * (bit-identical across engines). */
  val q30_text_quality = Q(
    "q30_text_quality",
    Some("""SELECT doc_id,
            |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
            |  CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_letter_chars,
            |  CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
            |  CAST(len(list_filter(string_split(text, ' '),
            |       t -> t IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
            |    / len(string_split(text, ' ')) AS stopword_ratio
            |FROM documents
            |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val toks = tokens(col("text"))
      val nTokens = size(toks).cast("long")
      val nLetter = length(regexp_replace(col("text"), " ", "")).cast("long")
      Tables.documents(s, d).select(
        col("doc_id"),
        nTokens.as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        nLetter.as("n_letter_chars"),
        (nLetter.cast("double") / nTokens).as("avg_token_len"),
        (size(filter(toks, t => t.isin("the", "a", "of", "and"))).cast("double") / nTokens)
          .as("stopword_ratio"))
        .orderBy("doc_id")
    })

  /** Language-ID heuristic (marker-token n-gram heuristic; deterministic,
    * scored against the labeled lang column). */
  val q31_langid = Q(
    "q31_langid",
    Some("""SELECT lang,
            |  CASE WHEN contains(text, 'the ') THEN 'en'
            |       WHEN contains(text, 'data ') THEN 'de'
            |       ELSE 'und' END AS predicted,
            |  count(*) AS n
            |FROM documents
            |GROUP BY 1, 2
            |ORDER BY lang, predicted""".stripMargin),
    (s, d) => Tables.documents(s, d)
      .groupBy(
        col("lang"),
        when(col("text").contains("the "), "en")
          .when(col("text").contains("data "), "de")
          .otherwise("und").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted"))

  /** Term frequency top-20: explode → hash agg (map-side partials) →
    * TakeOrderedAndProject. */
  val q32_term_freq = Q(
    "q32_term_freq",
    Some("""SELECT term, count(*) AS freq FROM (
            |  SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
            |GROUP BY term
            |ORDER BY freq DESC, term
            |LIMIT 20""".stripMargin),
    (s, d) => Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(20))

  /** Document fingerprinting: content hash + prefix hash (md5 — identical
    * hex in both engines; the prefix fingerprint is the rolling-hash-style
    * early-dedup key). */
  val q33_fingerprint = Q(
    "q33_fingerprint",
    Some("""SELECT doc_id,
            |  md5(text) AS content_fp,
            |  md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_fp
            |FROM documents
            |ORDER BY doc_id""".stripMargin),
    (s, d) => Tables.documents(s, d).select(
      col("doc_id"),
      md5(col("text")).as("content_fp"),
      md5(concat_ws(" ", slice(tokens(col("text")), 1, 8))).as("prefix_fp"))
      .orderBy("doc_id"))

  /** Exact dedup: group by content, keep min doc_id (deterministic keeper —
    * unlike dropDuplicates, whose survivor is partition-order dependent). */
  val q34_dedup_exact = Q(
    "q34_dedup_exact",
    Some("""SELECT md5(text) AS content_fp, min(doc_id) AS keep_id,
            |       count(*) AS n_copies
            |FROM documents
            |GROUP BY md5(text)
            |ORDER BY keep_id""".stripMargin),
    (s, d) => Tables.documents(s, d)
      .groupBy(md5(col("text")).as("content_fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id"))

  /** Exact n-gram Jaccard on a bounded sample (the verify kernel of the
    * LSH pipeline, exercised exhaustively on 100 docs — O(k²) by design;
    * the scale path is q36). */
  val q35_ngram_jaccard = Q(
    "q35_ngram_jaccard",
    Some("""WITH sh AS (
            |  SELECT doc_id, list_distinct(list_transform(
            |    generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
            |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
            |         || ' ' || string_split(text,' ')[i+2])) AS sset
            |  FROM documents WHERE doc_id < 100)
            |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            |  CAST(len(list_filter(a.sset, x -> list_contains(b.sset, x))) AS DOUBLE)
            |    / (len(a.sset) + len(b.sset)
            |       - len(list_filter(a.sset, x -> list_contains(b.sset, x)))) AS jaccard
            |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            |WHERE CAST(len(list_filter(a.sset, x -> list_contains(b.sset, x))) AS DOUBLE)
            |    / (len(a.sset) + len(b.sset)
            |       - len(list_filter(a.sset, x -> list_contains(b.sset, x)))) >= 0.02
            |ORDER BY doc_a, doc_b""".stripMargin),
    (s, d) => {
      val sh = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), graft.functions.TextFunctions.shingleSet(tokens(col("text"))).as("sset"))
      val a = sh.select(col("doc_id").as("doc_a"), col("sset").as("sa"))
      val b = sh.select(col("doc_id").as("doc_b"), col("sset").as("sb"))
      val inter = size(array_intersect(col("sa"), col("sb")))
      val jac = inter.cast("double") / (size(col("sa")) + size(col("sb")) - inter)
      a.join(b, col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
        .filter(col("jaccard") >= 0.02)
        .orderBy("doc_a", "doc_b")
    })

  private[queries] val MinhashK = 8

  /** MinHash + LSH near-duplicate detection, fully oracle-checked:
    * shingle → 8-component md5-minhash signature → 8 single-row bands →
    * band-bucket self-join (shuffle partitioned by band hash, no driver
    * state) → exact Jaccard verify on candidates → pairs ≥ 0.15.
    * The one O(n²) risk — giant buckets — is bounded by band-hash
    * uniformity; at 100 TB the band groupBy is the only shuffle. */
  /** Shared WITH-prefix replaying the whole LSH pipeline in SQL, ending in
    * a `pairs(doc_a, doc_b, jaccard)` CTE — q36 selects it directly, q73
    * closes it transitively into clusters. */
  private[queries] def lshPairsSqlPrefix: String = {
    val sigExprs = (0 until MinhashK)
      .map(i => minhashRotSql("hs", i) + s" AS sig_$i").mkString(",\n  ")
    val bandRows = (0 until MinhashK)
      .map(i => s"SELECT doc_id, $i AS band, sig_$i AS h FROM sig").mkString("\n  UNION ALL ")
    s"""WITH RECURSIVE tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(len(toks) - 2, 0)),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
       |  FROM tok),
       |hsh AS (
       |  SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hs FROM sh),
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
       |dsh AS (SELECT doc_id, list_distinct(shingles) AS sset FROM sh),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_filter(x.sset, v -> list_contains(y.sset, v))) AS DOUBLE)
       |      / (len(x.sset) + len(y.sset)
       |         - len(list_filter(x.sset, v -> list_contains(y.sset, v)))) AS jaccard
       |  FROM cand JOIN dsh x ON cand.doc_a = x.doc_id
       |            JOIN dsh y ON cand.doc_b = y.doc_id
       |  WHERE CAST(len(list_filter(x.sset, v -> list_contains(y.sset, v))) AS DOUBLE)
       |      / (len(x.sset) + len(y.sset)
       |         - len(list_filter(x.sset, v -> list_contains(y.sset, v)))) >= 0.15)""".stripMargin
  }

  val q36_minhash_lsh = Q(
    "q36_minhash_lsh",
    Some(s"""$lshPairsSqlPrefix
            |SELECT doc_a, doc_b, jaccard FROM pairs
            |ORDER BY doc_a, doc_b""".stripMargin),
    (s, d) => graft.operators.Dedup.minhashNearDupPairs(
        Tables.documents(s, d), "doc_id", "text",
        k = MinhashK, shingleN = 3, threshold = 0.15)
      .orderBy("doc_a", "doc_b"))

  /** Near-dup CLUSTERS: the transitive closure of q36's verified pairs,
    * labeled by min member id (operators/Dedup.connectedComponents —
    * min-label propagation + pointer jumping, O(log diameter) rounds of
    * node-keyed joins). Oracle: a recursive CTE computes each node's
    * reachable set and takes its min — exactly the component id the
    * distributed algorithm converges to. */
  val q73_neardup_clusters = Q(
    "q73_neardup_clusters",
    Some(s"""$lshPairsSqlPrefix,
            |edges AS (
            |  SELECT doc_a AS u, doc_b AS v FROM pairs
            |  UNION SELECT doc_b, doc_a FROM pairs),
            |cnodes AS (SELECT DISTINCT u AS node FROM edges),
            |reach AS (
            |  SELECT node, node AS m FROM cnodes
            |  UNION
            |  SELECT r.node, e.v AS m FROM reach r JOIN edges e ON e.u = r.m)
            |SELECT node AS doc_id, min(m) AS cluster_id
            |FROM reach GROUP BY node
            |ORDER BY doc_id""".stripMargin),
    (s, d) => graft.operators.Dedup.nearDupClusters(
        Tables.documents(s, d), "doc_id", "text",
        k = MinhashK, shingleN = 3, threshold = 0.15)
      .orderBy("doc_id"))

  private val SimhashBits = 16

  /** Simhash: per-token md5 hex digits → 4 bit-count lanes packed per
    * digit (one sum carries 4 popcounts; identical bits to the ±1-sum
    * formulation since majority ⟺ 2·popcount ≥ n), sign-majority
    * reassembled into a 16-bit value. The digit/lane arithmetic SQL is
    * shared verbatim between Spark and the oracle. */
  val q37_simhash = Q(
    "q37_simhash", {
      val nDigits = SimhashBits / 4
      val digits = (0 until nDigits)
        .map(p => s"${hexDigitValSql("mh", p + 1)} AS v$p").mkString(", ")
      val lanes = (0 until nDigits)
        .map(p => s"CAST(sum(${packedBitLanesSql(s"v$p")}) AS BIGINT) AS ps$p")
        .mkString(",\n  ")
      val assemble = (0 until SimhashBits)
        .map(j => s"${simhashBitFromLanesSql(j)} * ${1L << j}")
        .mkString(" + ")
      Some(s"""WITH exploded AS (
            |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
            |hashed AS (SELECT doc_id, md5(tok) AS mh FROM exploded),
            |digits AS (SELECT doc_id, $digits FROM hashed),
            |bitsums AS (
            |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
            |  $lanes
            |  FROM digits GROUP BY doc_id)
            |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash
            |FROM bitsums
            |ORDER BY doc_id""".stripMargin)
    },
    (s, d) =>
      // one scan-side expression per document — no explode, no shuffle
      // (SimhashBits ≡ the oracle's explode → majority pipeline)
      Tables.documents(s, d)
        .select(col("doc_id"),
          simhashOf(tokens(col("text")), SimhashBits).as("simhash"))
        .orderBy("doc_id"))

  /** The dedup DECISION over q73's clusters: the highest-quality member
    * (n_chars, ties to lowest id) survives, the rest are listed for
    * subtraction — the artifact a curation pipeline actually applies.
    * Oracle extends the q73 closure with a ranked keeper per cluster. */
  val q88_cluster_keepers = Q(
    "q88_cluster_keepers",
    Some(s"""$lshPairsSqlPrefix,
            |edges AS (
            |  SELECT doc_a AS u, doc_b AS v FROM pairs
            |  UNION SELECT doc_b, doc_a FROM pairs),
            |cnodes AS (SELECT DISTINCT u AS node FROM edges),
            |reach AS (
            |  SELECT node, node AS m FROM cnodes
            |  UNION
            |  SELECT r.node, e.v AS m FROM reach r JOIN edges e ON e.u = r.m),
            |clusters AS (
            |  SELECT node AS doc_id, min(m) AS cluster_id
            |  FROM reach GROUP BY node),
            |ranked AS (
            |  SELECT c.cluster_id, c.doc_id,
            |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
            |      ORDER BY d.n_chars DESC, c.doc_id) AS rn
            |  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id)
            |SELECT cluster_id,
            |  min(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
            |  CAST(count(*) AS BIGINT) AS n_members,
            |  array_to_string(list_sort(list(doc_id) FILTER (WHERE rn <> 1)), ',')
            |    AS drop_ids
            |FROM ranked
            |GROUP BY cluster_id
            |ORDER BY cluster_id""".stripMargin),
    (s, d) => graft.operators.Dedup.clusterKeepers(
        Tables.documents(s, d), "doc_id", "text", col("n_chars"),
        k = MinhashK, shingleN = 3, threshold = 0.15)
      // the driver's comparator hashes scalars — ship the id list joined
      .withColumn("drop_ids", array_join(col("drop_ids"), ","))
      .orderBy("cluster_id"))

  val all: Seq[Q] = Seq(
    q29_token_stats, q30_text_quality, q31_langid, q32_term_freq,
    q33_fingerprint, q34_dedup_exact, q35_ngram_jaccard, q36_minhash_lsh,
    q37_simhash, q73_neardup_clusters, q88_cluster_keepers)
}
