package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.{Decoders, Envelope, RatecardSchema}
import graft.pipeline.KafkaToParquet

/** Reference-parity ingest exposed through the query catalog. These read the
  * reference's own golden fixture (not the sf tables), so they carry no
  * DuckDB oracle — the driver records rows-only checks; the real assertions
  * live in IngestSpec (golden-parquet equality). */
object Ingest {

  private val sampleEvent = "/root/reference/sample_kafka_event.json"
  private def haveFixture =
    java.nio.file.Files.exists(java.nio.file.Paths.get(sampleEvent))

  /** S1+F1-F4+P1-P3: envelope → binary records → key cascade + Confluent-
    * Avro decode → 19-col typed CDC frame (16 rows). */
  val ingest_envelope_decode = Q(
    "ingest_envelope_decode",
    None,
    (s, _) => {
      require(haveFixture, s"fixture missing: $sampleEvent")
      KafkaToParquet.decodeRecords(
        Envelope.readEventJson(s, sampleEvent),
        RatecardSchema.topic, RatecardSchema.provider)
        .orderBy("RATE_CARD_ID")
    })

  /** A1/A2 on the decoded batch: the v2 response body
    * (lambda_function_with_AWS_datawrangler.py:67-72,218-224). */
  val ingest_batch_counts = Q(
    "ingest_batch_counts",
    None,
    (s, _) => {
      require(haveFixture, s"fixture missing: $sampleEvent")
      KafkaToParquet.decodeRecords(
        Envelope.readEventJson(s, sampleEvent),
        RatecardSchema.topic, RatecardSchema.provider)
        .agg(count(lit(1)).as("total_records"),
          count_distinct(col("SRC_KEY_VAL")).as("distinct_records"))
    })

  /** F2 cascade + F6 partition derivation over the envelope metadata. */
  val ingest_key_decode = Q(
    "ingest_key_decode",
    None,
    (s, _) => {
      require(haveFixture, s"fixture missing: $sampleEvent")
      val recs = Envelope.readEventJson(s, sampleEvent)
      recs.select(
        col("topic"), col("partition"), col("offset"),
        Decoders.decodeKey(col("key")).as("kafka_key"))
        .orderBy("partition", "offset", "kafka_key")
    })

  val all: Seq[Q] = Seq(ingest_envelope_decode, ingest_batch_counts, ingest_key_decode)
}
