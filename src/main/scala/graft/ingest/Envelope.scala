package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1: the Lambda-event JSON envelope (sample_kafka_event.json;
  * consumed at lambda_function.py:188-204) read into the canonical Kafka
  * record frame — the same column set `spark.readStream.format("kafka")`
  * produces (key/value binary + topic/partition/offset/timestamp), so the
  * batch test path and a live Kafka stream feed the identical pipeline.
  */
object Envelope {

  /** One Kafka record inside the envelope (sample_kafka_event.json:7-14). */
  val recordSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", LongType), // epoch millis
    StructField("timestampType", StringType),
    StructField("key", StringType),    // base64
    StructField("value", StringType),  // base64 Confluent-framed Avro
    StructField("headers", ArrayType(
      StructType(Seq(StructField("key", StringType),
        StructField("value", ArrayType(IntegerType))))))))

  /** The whole event: records is a map keyed by "topic-partition"
    * (sample_kafka_event.json:5; iterated at lambda_function.py:199-204). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("bootstrapServers", StringType),
    StructField("eventSource", StringType),
    StructField("records", MapType(StringType, ArrayType(recordSchema)))))

  /** Read envelope JSON file(s) → one row per Kafka record with binary
    * key/value (F1 base64 decode, lambda_function.py:147,165) and Kafka
    * metadata columns. Per-partition record order is preserved by
    * posexplode, matching the reference's in-order iteration. */
  def readEventJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).schema(envelopeSchema).json(path)
      .select(explode(col("records")).as(Seq("topic_partition", "recs")))
      .select(posexplode(col("recs")).as(Seq("pos", "r")))
      .select(
        col("r.topic").as("topic"),
        col("r.partition").as("partition"),
        col("r.offset").as("offset"),
        timestamp_millis(col("r.timestamp")).as("timestamp"),
        col("r.timestampType").as("timestampType"),
        unbase64(col("r.key")).as("key"),
        unbase64(col("r.value")).as("value"))
}
