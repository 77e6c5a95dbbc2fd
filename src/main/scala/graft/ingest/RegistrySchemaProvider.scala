package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64

/** S5/S6: Confluent Schema Registry client — driver-side HTTP GET of
  * `/subjects/{topic}-value/versions/latest` (the exact REST shape the
  * reference shows at lambda_function.py:122-131 and
  * schema_registry_connect.py:90-100), with optional Basic auth (the
  * authenticated path of schema_registry_connect.py:34-66, minus the
  * Secrets Manager hop — credentials are injected by the caller, keeping
  * the secret store a config seam).
  *
  * Fetch happens once on the driver (wrap in [[CachingSchemaProvider]]);
  * executors receive the schema string inside the decode expression, so no
  * network access ever happens on the data path — exactly the reference's
  * fetch-once/memoize design (lambda_function_with_AWS_datawrangler.py:93-123).
  */
final class RegistrySchemaProvider(
    baseUrl: String,
    credentials: Option[(String, String)] = None)
    extends SchemaProvider {

  @transient private lazy val client = HttpClient.newHttpClient()

  def valueSchema(topic: String): String = {
    val subject = s"$topic-value" // subject naming: lambda_function.py:119
    val builder = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/subjects/$subject/versions/latest"))
      .GET()
    credentials.foreach { case (user, pass) =>
      val token = Base64.getEncoder.encodeToString(
        s"$user:$pass".getBytes(StandardCharsets.UTF_8))
      builder.header("Authorization", s"Basic $token")
    }
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      // E6: schema is load-bearing — fail fast (SURVEY.md §2.7)
      throw new IllegalStateException(
        s"schema registry returned ${resp.statusCode()} for $subject")
    extractSchemaField(resp.body())
  }

  /** Pull the "schema" string field out of the registry's JSON response
    * without a JSON library dependency: registry responses are flat
    * objects whose schema field is a JSON-escaped string. */
  private[ingest] def extractSchemaField(body: String): String = {
    val key = "\"schema\""
    val at = body.indexOf(key)
    require(at >= 0, s"no schema field in registry response: $body")
    val colon = body.indexOf(':', at + key.length)
    val start = body.indexOf('"', colon + 1)
    val sb = new StringBuilder
    var i = start + 1
    var done = false
    while (!done && i < body.length) {
      body.charAt(i) match {
        case '"' => done = true
        case '\\' =>
          body.charAt(i + 1) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case '"' => sb.append('"')
            case '\\' => sb.append('\\'); case '/' => sb.append('/')
            case 'u' =>
              sb.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar)
              i += 4
            case other => sb.append(other)
          }
          i += 1
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
