package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 text additions: graph-based keyword extraction. */
object TextOps12 {

  private val TrIters = 3
  private val TrDamping = 0.85
  private val TrTopK = 20
  private val TrWindow = 2 // co-occurrence distance 1..2

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): tokens
    * co-occurring within distance ≤ 2 form a weighted undirected graph
    * (weight = co-occurrence count, self-loops dropped), scored by
    * weighted PageRank — TR(v) = (1−d) + d·Σ w_uv/W_u·TR(u) — with
    * TR₀ = 1; top-20 words by round-6 score. Complements q134 (PMI
    * scores PAIRS by pointwise surprise; TextRank scores WORDS by graph
    * centrality) and q117 (unweighted, per-out-degree mass split).
    *
    * Determinism discipline = q117's: each contribution is
    * round(·, 12) → DECIMAL(28,12) sum → double, so partial-agg order
    * can't move a bit on either engine. Per iteration: one edges⋈ranks
    * join + one dst-keyed agg — constant shuffle count, term-keyed
    * throughout; the token explode is scan-side. Edges+wdeg persist
    * once (the q315 lesson: every iteration re-reads them at two join
    * sites). */
  val q383_textrank = Q(
    "q383_textrank", {
      val d = "CAST(0.85 AS DOUBLE)"
      def iter(prev: String, out: String) =
        s"""c$out AS (
           |  SELECT e.dst,
           |    CAST(sum(CAST(round(p.tr * e.w / e.wd, 12)
           |      AS DECIMAL(28,12))) AS DOUBLE) AS s
           |  FROM ew e JOIN p$prev p ON p.word = e.src
           |  GROUP BY e.dst),
           |p$out AS (
           |  SELECT n.word,
           |    (CAST(1 AS DOUBLE) - $d) + $d * coalesce(c.s, CAST(0 AS DOUBLE)) AS tr
           |  FROM n LEFT JOIN c$out c ON c.dst = n.word)""".stripMargin
      Some(s"""WITH toks AS (
              |  SELECT string_split(text, ' ') AS ts FROM documents),
              |pairs AS (
              |  SELECT CASE WHEN p.a < p.b THEN p.a ELSE p.b END AS w1,
              |         CASE WHEN p.a < p.b THEN p.b ELSE p.a END AS w2
              |  FROM (
              |    SELECT unnest(flatten(list_transform(range(1, len(ts)),
              |      i -> list_transform(
              |             range(i + 1, least(i + $TrWindow, len(ts)) + 1),
              |             j -> {'a': ts[i], 'b': ts[j]})))) AS p
              |    FROM toks) t
              |  WHERE p.a <> p.b),
              |und AS (
              |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS w
              |  FROM pairs GROUP BY 1, 2),
              |e AS (
              |  SELECT w1 AS src, w2 AS dst, w FROM und
              |  UNION ALL SELECT w2, w1, w FROM und),
              |wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wd
              |         FROM e GROUP BY src),
              |ew AS (SELECT e.src, e.dst, e.w, dg.wd
              |       FROM e JOIN wdeg dg ON dg.src = e.src),
              |n AS (SELECT DISTINCT src AS word FROM e),
              |p0 AS (SELECT word, CAST(1 AS DOUBLE) AS tr FROM n),
              |${iter("0", "1")},
              |${iter("1", "2")},
              |${iter("2", "3")}
              |SELECT word, round(tr, 6) AS score
              |FROM p3
              |ORDER BY score DESC, word
              |LIMIT $TrTopK""".stripMargin)
    },
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(split(col("text"), " ").as("ts"))
      val pairs = toks
        .select(explode(expr(
          s"flatten(transform(sequence(1, size(ts) - 1), i -> " +
            s"transform(sequence(i + 1, least(i + $TrWindow, size(ts))), " +
            "j -> struct(element_at(ts, i) AS a, element_at(ts, j) AS b))))"))
          .as("p"))
        .filter(col("p.a") =!= col("p.b"))
        .select(least(col("p.a"), col("p.b")).as("w1"),
          greatest(col("p.a"), col("p.b")).as("w2"))
      val und = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("w"))
      val e = und.select(col("w1").as("src"), col("w2").as("dst"), col("w"))
        .unionByName(und.select(col("w2").as("src"), col("w1").as("dst"),
          col("w")))
      val wdeg = e.groupBy("src").agg(sum("w").cast("long").as("wd"))
      val ew = graft.operators.PlanCache.persist(e.join(wdeg, "src"))
      val nodes = graft.operators.PlanCache.persist(
        ew.select(col("src").as("word")).distinct())
      var tr = nodes.withColumn("tr", lit(1.0))
      for (_ <- 0 until TrIters) {
        val sums = ew.join(tr, ew("src") === tr("word"))
          .select(col("dst"),
            round(col("tr") * col("w") / col("wd"), 12)
              .cast("decimal(28,12)").as("c"))
          .groupBy("dst").agg(sum("c").cast("double").as("s"))
        tr = nodes.join(sums, nodes("word") === sums("dst"), "left")
          .select(col("word"),
            (lit(1.0 - TrDamping) +
              lit(TrDamping) * coalesce(col("s"), lit(0.0))).as("tr"))
      }
      tr.select(col("word"), round(col("tr"), 6).as("score"))
        .orderBy(col("score").desc, col("word"))
        .limit(TrTopK)
    })

  val all: Seq[Q] = Seq(q383_textrank)
}
