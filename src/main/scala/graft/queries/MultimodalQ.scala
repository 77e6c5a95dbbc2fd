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

  /** JPEG header mining, proven by construction-inversion: each document
    * deterministically BUILDS a structurally-valid JPEG byte stream — SOI,
    * 1–3 APPn segments of varying lengths whose payloads are stuffed with
    * decoy FFC0 bytes (a pattern-scan parser would false-positive), then
    * the real SOF0 carrying formula-derived dimensions, EOI; every 17th
    * document is truncated mid-segment. Spark PARSES the bytes back with
    * the native segment walker (functions/JpegSofDims); the oracle states
    * the construction formulas (NULL for the truncated ones). A hash
    * match proves the walker inverts arbitrary segment layouts and
    * rejects corruption — same spirit as q43's replayable stub, but here
    * the parser is real. Scan-side end to end: construct and parse are
    * one projection, no shuffle. */
  val q111_jpeg_dims = Q(
    "q111_jpeg_dims",
    Some("""SELECT doc_id,
            |  CASE WHEN doc_id % 17 = 0 THEN NULL
            |       ELSE CAST((doc_id * 7) % 3000 + 1 AS INT) END AS width,
            |  CASE WHEN doc_id % 17 = 0 THEN NULL
            |       ELSE CAST(doc_id % 4000 + 1 AS INT) END AS height
            |FROM documents
            |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      def beU16Hex(v: org.apache.spark.sql.Column) =
        lpad(hex(v), 4, "0")
      def appSeg(i: Int) = {
        val reps = (col("doc_id") + lit(13 * i)) % 64 + 1
        // decoy payload: repeated FFC0 bytes a naive scanner would match
        when(col("doc_id") % 3 >= i,
          concat(lit(s"FFE$i"), beU16Hex(reps * 2 + 2), repeat(lit("FFC0"), reps.cast("int"))))
          .otherwise("")
      }
      val sof = concat(lit("FFC0"), lit("0011"), lit("08"),
        beU16Hex(col("doc_id") % 4000 + 1),          // height
        beU16Hex((col("doc_id") * 7) % 3000 + 1),    // width
        lit("03"), lit("011100"), lit("021101"), lit("031101"))
      val fullHex = concat(lit("FFD8"), appSeg(0), appSeg(1), appSeg(2),
        sof, lit("FFD9"))
      val payloadHex = when(col("doc_id") % 17 === 0,
        substring(fullHex, 1, 12)).otherwise(fullHex)
      Tables.documents(s, d)
        .select(col("doc_id"),
          Multimodal.jpegDims(unhex(payloadHex)).as("dims"))
        .select(col("doc_id"),
          col("dims.width").as("width"), col("dims.height").as("height"))
        .orderBy("doc_id")
    })

  val all: Seq[Q] = Seq(q42_multimodal_blob, q43_multimodal_features,
    q111_jpeg_dims)
}
