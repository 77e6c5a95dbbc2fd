package graft.ingest

/** S5/S6 seam: per-topic value-schema lookup (subject "{topic}-value",
  * latest version), with memoization as in the reference's cached variant
  * (lambda_function_with_AWS_datawrangler.py:61,93-123).
  *
  * Offline, schemas come from fixtures; online, `RegistrySchemaProvider`
  * would GET `/subjects/{topic}-value/versions/latest` (the exact REST
  * shape the reference shows commented at lambda_function.py:122-131) —
  * a config seam only, since this environment has zero egress.
  */
trait SchemaProvider extends Serializable {
  def valueSchema(topic: String): String
}

/** Memoizing wrapper (driver-side fetch-once; the decode expression embeds
  * the schema string, so executors never fetch). */
final class CachingSchemaProvider(underlying: SchemaProvider)
    extends SchemaProvider {
  @transient private lazy val cache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  def valueSchema(topic: String): String =
    cache.getOrElseUpdate(topic, underlying.valueSchema(topic))
}

/** Fixture-backed provider for offline operation and tests. */
final class FixtureSchemaProvider(fixtures: Map[String, String])
    extends SchemaProvider {
  def valueSchema(topic: String): String =
    fixtures.getOrElse(topic,
      throw new NoSuchElementException(s"no schema fixture for topic $topic"))
}

/** The golden topic's writer schema (registry id 391), reverse-engineered
  * byte-exactly from the 16 sample values in
  * /root/reference/sample_kafka_event.json against the golden parquet:
  * 14 leading union[null,T] CDC payload fields + 5 trailing non-null
  * CDC-metadata strings. (The golden parquet shows EPSD_IMP_EST_FILE_TYP_ID
  * as double only because pandas widened the nullable long —
  * SURVEY.md §7.4; the wire type is long.)
  */
object RatecardSchema {
  val topic = "lndcdcadsrtcrd_ratecard"

  private def opt(name: String, t: String): String =
    s"""{"name":"$name","type":["null","$t"]}"""
  private def req(name: String, t: String): String =
    s"""{"name":"$name","type":"$t"}"""

  val schemaJson: String =
    s"""{"type":"record","name":"RATECARD","namespace":"lndcdcadsrtcrd","fields":[
       |${opt("RATE_CARD_ID", "long")},
       |${opt("LAST_MODIFIED_BY", "string")},
       |${opt("LAST_MODIFIED_DT", "string")},
       |${opt("RATE_CARD_TYPE_ID", "long")},
       |${opt("BASE_INVENTORY_TYPE_ID", "long")},
       |${opt("DIVISION_ID", "long")},
       |${opt("RATE_CARD_NM", "string")},
       |${opt("RATE_CARD_DESC", "string")},
       |${opt("RATE_CARD_COMMENT_TXT", "string")},
       |${opt("BASE_UNIT_LENGTH", "long")},
       |${opt("CRNCY_ID", "long")},
       |${opt("PRICING_RATING_ROLLOVER_IND", "long")},
       |${opt("EPSD_IMP_EST_FILE_TYP_ID", "long")},
       |${opt("CNCRNCY_VRSN", "long")},
       |${req("SRC_KEY_VAL", "string")},
       |${req("SRC_CDC_OPER_NM", "string")},
       |${req("SRC_COMMIT_DT_UTC", "string")},
       |${req("TRG_CRT_DT_PART_UTC", "string")},
       |${req("SRC_SCHEMA_NM", "string")}
       |]}""".stripMargin

  val provider: SchemaProvider =
    new CachingSchemaProvider(
      new FixtureSchemaProvider(Map(topic -> schemaJson)))
}
