package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal catalog entries: the oracle-checkable binary-column analytics
  * (blob sizes/byte stats per source) plus the rows-only feature-extraction
  * pipeline (stub codec, real plumbing — see operators/Multimodal.scala). */
object MultimodalQ {

  /** Opaque-binary column analytics: byte lengths and lead-byte stats per
    * source, computed on the binary payload itself. */
  val q42_multimodal_blob = Q(
    "q42_multimodal_blob",
    Some("""SELECT source, count(*) AS n_items,
            |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
            |  CAST(min(ascii(substr(text, 1, 1))) AS BIGINT) AS min_lead_byte,
            |  CAST(max(ascii(substr(text, 1, 1))) AS BIGINT) AS max_lead_byte
            |FROM documents
            |GROUP BY source
            |ORDER BY source""".stripMargin),
    (s, d) => Tables.documents(s, d)
      .select(col("source"),
        encode(col("text"), "UTF-8").as("payload"),
        ascii(substring(col("text"), 1, 1)).as("lead"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_items"),
        sum(length(col("payload")).cast("long")).as("total_bytes"),
        min(col("lead")).cast("long").as("min_lead_byte"),
        max(col("lead")).cast("long").as("max_lead_byte"))
      .orderBy("source"))

  /** Mirrors Multimodal.decodePayload's Long.parseLong(hex.substring(...),
    * 16) with the shared place-value-sum SQL (same hex-digit arithmetic
    * as the simhash oracle). */
  private def hexValSql(h: String, from: Int, len: Int): String =
    graft.functions.TextFunctions.hexSpanValSql(h, from, len)

  /** Full stub-decode feature pipeline over the media frame — the codec is
    * the documented md5-derived stub, so the oracle replays it exactly and
    * the mapPartitions plumbing (schema, batch shape, per-partition init)
    * is hash-checked end-to-end. */
  val q43_multimodal_features = Q(
    "q43_multimodal_features",
    Some(s"""WITH f AS (
            |  SELECT doc_id AS media_id,
            |    (['image', 'audio', 'video', 'text'])[CAST(doc_id % 4 AS INT) + 1]
            |      AS media_type,
            |    source, n_chars AS n_bytes, md5(text) AS h
            |  FROM documents)
            |SELECT media_id, media_type, source, n_bytes,
            |  CAST(${hexValSql("h", 0, 6)} % 1920 + 1 AS INT) AS width,
            |  CAST(${hexValSql("h", 6, 6)} % 1080 + 1 AS INT) AS height,
            |  CASE WHEN media_type IN ('video', 'audio')
            |       THEN ${hexValSql("h", 12, 12)} % 600000 ELSE 0
            |  END AS duration_ms,
            |  ${hexValSql("h", 24, 8)} AS checksum
            |FROM f
            |ORDER BY media_id""".stripMargin),
    (s, d) => Multimodal.extractFeatures(Multimodal.fromDocuments(s, d))
      .toDF()
      .orderBy("media_id"))

  val all: Seq[Q] = Seq(q42_multimodal_blob, q43_multimodal_features)
}
