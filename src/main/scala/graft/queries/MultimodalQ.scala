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

  /** Rows-only: full stub-decode feature pipeline over the media frame
    * (schema/partitioning/batch shape under test; codec stubbed). */
  val q43_multimodal_features = Q(
    "q43_multimodal_features",
    None,
    (s, d) => Multimodal.extractFeatures(Multimodal.fromDocuments(s, d))
      .toDF()
      .orderBy("media_id"))

  val all: Seq[Q] = Seq(q42_multimodal_blob, q43_multimodal_features)
}
