package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{CachingSchemaProvider, RegistrySchemaProvider, RatecardSchema}
import graft.sources.S3Config

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Parity seams: Schema Registry HTTP fetch (against a local in-JVM test
  * server — zero-egress), memoization, Basic auth header, SSE-KMS conf. */
class SeamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withRegistry[A](handler: HttpExchange => Unit)(f: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handler(ex))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def jsonEscape(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                case c => c.toString }

  test("registry provider GETs /subjects/{topic}-value/versions/latest and parses the schema") {
    val hits = new AtomicInteger(0)
    var seenPath = ""
    withRegistry { ex =>
      hits.incrementAndGet()
      seenPath = ex.getRequestURI.getPath
      val body =
        s"""{"subject":"t-value","version":1,"id":391,"schema":"${jsonEscape(RatecardSchema.schemaJson)}"}"""
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    } { url =>
      val provider = new CachingSchemaProvider(new RegistrySchemaProvider(url))
      val schema = provider.valueSchema("lndcdcadsrtcrd_ratecard")
      assert(seenPath == "/subjects/lndcdcadsrtcrd_ratecard-value/versions/latest")
      // fetched schema must drive the same decode as the fixture
      assert(new org.apache.avro.Schema.Parser().parse(schema) ==
        new org.apache.avro.Schema.Parser().parse(RatecardSchema.schemaJson))
      provider.valueSchema("lndcdcadsrtcrd_ratecard")
      assert(hits.get() == 1, "second lookup must hit the memo, not the registry")
    }
  }

  test("registry provider sends Basic auth and fails fast on non-200 (E6)") {
    var authHeader: Option[String] = None
    withRegistry { ex =>
      authHeader = Option(ex.getRequestHeaders.getFirst("Authorization"))
      ex.sendResponseHeaders(404, -1); ex.close()
    } { url =>
      val provider = new RegistrySchemaProvider(url, Some(("user", "secret")))
      val e = intercept[IllegalStateException](provider.valueSchema("nope"))
      assert(e.getMessage.contains("404"))
      assert(authHeader.contains("Basic dXNlcjpzZWNyZXQ="))
    }
  }

  test("SSE-KMS conf sets the reference's exact S3A keys (S4)") {
    S3Config.applySseKms(spark, "arn:aws:kms:us-east-1:000000000000:key/test")
    val conf = spark.sparkContext.hadoopConfiguration
    assert(conf.get("fs.s3a.server-side-encryption-algorithm") == "SSE-KMS")
    assert(conf.get("fs.s3a.server-side-encryption.key").endsWith("key/test"))
  }

  test("partition-glob read over the batch layout (S3 parity)") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("/root/reference/sample_kafka_event.json")))
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_glob").toString
    val recs = graft.ingest.Envelope.readEventJson(
      spark, "/root/reference/sample_kafka_event.json")
    val decoded = graft.pipeline.KafkaToParquet.decodeRecords(
      recs, RatecardSchema.topic, RatecardSchema.provider)
    graft.pipeline.KafkaToParquet.writeBatch(decoded, RatecardSchema.topic,
      out, "SRC_KEY_VAL", java.time.Instant.parse("2021-09-02T18:00:00Z"))
    val back = S3Config.readPartition(spark, out, RatecardSchema.topic, "2021")
    assert(back.count() == 16)
  }
}
