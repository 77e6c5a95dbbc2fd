package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Text ops, part 4: subword-style token counting and winnowing document
  * fingerprints — the two remaining text-pipeline staples next to
  * whitespace tokens (q29) and whole-content hashing (q33).
  */
object TextOps4 {

  /** BPE-ish tokenizer pattern: letter runs, single digits, single
    * non-alphanumeric marks — the shape (not the vocab) of byte-pair
    * tokenizer pretokenization. Disjoint alternatives, so Java regex and
    * RE2 agree on the match sequence. */
  private val BpePat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  /** Whitespace vs regex token counts per language + the blowup ratio a
    * capacity planner actually wants (exact int sums, double at the end). */
  val q58_bpe_tokens = Q(
    "q58_bpe_tokens",
    Some(s"""SELECT lang,
            |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
            |  CAST(sum(len(regexp_extract_all(text, '${BpePat.replace("\\", "\\\\")}'))) AS BIGINT)
            |    AS bpe_tokens,
            |  CAST(sum(len(regexp_extract_all(text, '${BpePat.replace("\\", "\\\\")}'))) AS DOUBLE)
            |    / sum(len(string_split(text, ' '))) AS blowup
            |FROM documents
            |GROUP BY lang
            |ORDER BY lang""".stripMargin),
    (s, d) => {
      val bpe = size(regexp_extract_all(col("text"), lit(BpePat), lit(0))).cast("long")
      val ws = size(split(col("text"), " ")).cast("long")
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(sum(ws).as("ws_tokens"), sum(bpe).as("bpe_tokens"))
        .select(col("lang"), col("ws_tokens"), col("bpe_tokens"),
          (col("bpe_tokens").cast("double") / col("ws_tokens")).as("blowup"))
        .orderBy("lang")
    })

  private val K = 5 // char k-gram width
  private val W = 4 // winnow window (k-grams per window)

  /** Winnowing fingerprints (the MOSS scheme, Schleimer et al. 2003):
    * char K-gram rolling hashes → min hash per W-window → the distinct
    * mins are the document's fingerprint set. Guarantees any shared
    * substring of length ≥ K+W-1 contributes a shared fingerprint.
    * All scan-side per-row array expressions (md5 stands in for the
    * Karp-Rabin rolling hash — same selection semantics, engine-portable);
    * emitted as a per-doc summary so the result stays compact. */
  val q59_winnowing = Q(
    "q59_winnowing",
    Some(s"""WITH g AS (
            |  SELECT doc_id,
            |    list_transform(generate_series(1, len(text) - ${K - 1}),
            |      i -> md5(substr(text, i, $K))) AS gh
            |  FROM documents WHERE len(text) >= $K),
            |w AS (
            |  SELECT doc_id, gh,
            |    list_transform(generate_series(1, len(gh) - ${W - 1}),
            |      j -> list_min(gh[j:j+${W - 1}])) AS fps
            |  FROM g WHERE len(gh) >= $W)
            |SELECT doc_id,
            |  CAST(len(gh) AS BIGINT) AS n_grams,
            |  CAST(len(list_distinct(fps)) AS BIGINT) AS n_fps,
            |  list_min(fps) AS min_fp,
            |  list_max(fps) AS max_fp
            |FROM w
            |ORDER BY doc_id""".stripMargin),
    (s, d) => Tables.documents(s, d)
      .filter(length(col("text")) >= K)
      .withColumn("gh",
        graft.functions.TextFunctions.charGramsMd5(col("text"), K))
      .filter(size(col("gh")) >= W)
      .withColumn("fps",
        graft.functions.TextFunctions.slidingMins(col("gh"), W))
      .select(col("doc_id"),
        size(col("gh")).cast("long").as("n_grams"),
        size(array_distinct(col("fps"))).cast("long").as("n_fps"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
      .orderBy("doc_id"))

  private val BenchIds = 20   // doc_id < 20 plays the benchmark set
  private val MinShared = 3   // shared 3-gram shingles to flag

  /** Benchmark decontamination: flag training documents sharing ≥ K word
    * n-gram shingles with any benchmark document — the overlap check every
    * pretraining pipeline runs before a corpus ships. The shape is a
    * shingle INVERTED INDEX join (explode md5'd shingles on both sides,
    * equi-join on the hash, count matches per doc pair): one shuffle on
    * the shingle hash, no pairwise document comparison — the benchmark
    * side is tiny, so at 100 TB the join is a broadcast and the corpus
    * never shuffles at all. 32-char md5s travel, never raw n-grams. */
  val q84_decontamination = Q(
    "q84_decontamination",
    Some(s"""WITH sh AS (
            |  SELECT doc_id, unnest(list_distinct(list_transform(
            |    generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
            |    i -> md5(string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
            |         || ' ' || string_split(text,' ')[i+2])))) AS h
            |  FROM documents),
            |bench AS (SELECT doc_id AS bench_id, h FROM sh WHERE doc_id < $BenchIds),
            |train AS (SELECT doc_id, h FROM sh WHERE doc_id >= $BenchIds)
            |SELECT train.doc_id, bench.bench_id,
            |  CAST(count(*) AS BIGINT) AS n_shared
            |FROM train JOIN bench ON train.h = bench.h
            |GROUP BY train.doc_id, bench.bench_id
            |HAVING count(*) >= $MinShared
            |ORDER BY doc_id, bench_id""".stripMargin),
    (s, d) => {
      import graft.functions.TextFunctions.{md5Shingles, tokens}
      val sh = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(md5Shingles(tokens(col("text")), 3)).as("h"))
      val bench = sh.filter(col("doc_id") < BenchIds)
        .select(col("doc_id").as("bench_id"), col("h"))
      val train = sh.filter(col("doc_id") >= BenchIds)
      train.join(broadcast(bench), "h")
        .groupBy("doc_id", "bench_id")
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= MinShared)
        .orderBy("doc_id", "bench_id")
    })

  val all: Seq[Q] = Seq(q58_bpe_tokens, q59_winnowing, q84_decontamination)
}
