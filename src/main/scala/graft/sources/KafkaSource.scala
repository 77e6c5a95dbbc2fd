package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 live path: the Structured Streaming Kafka source, configured the way
  * the reference's event-source trigger is (bootstrap servers + topic,
  * lambda_function.py:188-204 consumes exactly this record shape), and
  * returning the canonical record frame — key/value binary +
  * topic/partition/offset/timestamp — that `KafkaToParquet.runStream`
  * consumes. The batch envelope reader (`ingest/Envelope.readEventJson`)
  * produces the same columns, so the two sources are interchangeable
  * upstream of the pipeline.
  *
  * This container ships no Kafka broker or connector jar, so `records` is
  * exercised in production deployments only (add spark-sql-kafka to the
  * classpath); `options` is the pure, tested part. Secrets (SASL etc.)
  * stay caller-injected — the same seam as the registry credentials.
  */
object KafkaSource {

  /** Option map for `readStream.format("kafka")`: earliest offsets by
    * default (the reference's trigger delivers every record exactly once
    * to the Lambda; checkpointing supplies the equivalent resume point),
    * no data loss tolerated, and a bounded per-trigger intake so a
    * backlogged topic cannot produce an unbounded micro-batch. */
  def options(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 100000L,
      extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "true",
      "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString) ++ extra

  /** The live streaming record frame (requires the Kafka connector on the
    * classpath and a reachable broker). */
  def records(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 100000L,
      extra: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .format("kafka")
      .options(options(bootstrapServers, topic, startingOffsets,
        maxOffsetsPerTrigger, extra))
      .load()
      .selectExpr("key", "value", "topic", "partition", "offset", "timestamp")
}
