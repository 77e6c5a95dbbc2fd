package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Round-11 text additions: term burstiness — the df-vs-cf lens on
  * vocabulary behavior.
  */
object TextOps13 {

  /** Church–Gale term BURSTINESS over the top-20 collection-frequency
    * terms: cf/df — how many times a term repeats per document that
    * contains it at all. Content words burst (a doc about "kafka" says
    * it ten times); function words spread (cf/df ≈ corpus-wide rate) —
    * the diagnostic that separates boilerplate vocabulary from topical
    * vocabulary where raw frequency (q32) and IDF alone cannot, and
    * the signal the q311 boilerplate audit's shingle view gives only
    * indirectly. IDF is carried alongside so the two axes read
    * together (bursty+rare = topical; flat+common = glue).
    *
    * Scale shape: one term-keyed hash agg (count + distinct-doc count
    * share the shuffle), a 1-row doc-count broadcast, TakeOrdered
    * top-20 — no windows, no joins beyond the broadcast. */
  val q430_term_burstiness = Q(
    "q430_term_burstiness",
    Some("""WITH tok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |  FROM documents),
           |tf AS (
           |  SELECT term, CAST(count(*) AS BIGINT) AS cf,
           |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           |  FROM tok GROUP BY term),
           |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
           |SELECT term, cf, df,
           |  round(CAST(cf AS DOUBLE) / df, 6) AS burstiness,
           |  round(ln(CAST(n_docs AS DOUBLE) / df), 6) AS idf
           |FROM tf CROSS JOIN nd
           |ORDER BY cf DESC, term
           |LIMIT 20""".stripMargin),
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text")))
          .as("term"))
      val tf = tok.groupBy("term")
        .agg(count(lit(1)).as("cf"), countDistinct("doc_id").as("df"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      tf.crossJoin(broadcast(nd))
        .select(col("term"), col("cf"), col("df"),
          round(col("cf").cast("double") / col("df"), 6).as("burstiness"),
          round(log(col("n_docs").cast("double") / col("df")), 6).as("idf"))
        .orderBy(col("cf").desc, col("term"))
        .limit(20)
    })

  val all: Seq[Q] = Seq(q430_term_burstiness)
}
