package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ConfluentAvroDecode, CosineSim, DotProduct}

/** SparkSessionExtensions hook: registers the engine's custom Catalyst
  * expressions as SQL functions, so a pure-SQL user (spark.sql, JDBC,
  * SQL files) gets the same operators as the Column API:
  *
  *   - vec_dot(a, b)          — codegen'd sequential dot product
  *   - vec_cosine(a, b)       — one-pass cosine similarity
  *   - confluent_avro(v, schemaJson) — Confluent-framed Avro decode
  *
  * Wire up either way:
  *   SparkSession.builder().withExtensions(new GraftExtensions) — code, or
  *   spark.sql.extensions=graft.GraftExtensions                 — config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential dot product of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes two arguments")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_cosine(a, b) takes two arguments")
        CosineSim(args(0), args(1))
      }))
    def avroBuilder(name: String, permissive: Boolean)
        : Seq[Expression] => Expression = { args =>
      require(args.length == 2, s"$name(value, schemaJson) takes two arguments")
      val schemaJson = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(s, _) if s != null =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"$name schema must be a string literal, got $other")
      }
      ConfluentAvroDecode(args(0), schemaJson, permissive)
    }
    ext.injectFunction((FunctionIdentifier("confluent_avro"),
      info("confluent_avro",
        "confluent_avro(value, schemaJson) - decode a Confluent-framed Avro binary value"),
      avroBuilder("confluent_avro", permissive = false)))
    ext.injectFunction((FunctionIdentifier("try_confluent_avro"),
      info("try_confluent_avro",
        "try_confluent_avro(value, schemaJson) - like confluent_avro but corrupt records decode to NULL"),
      avroBuilder("try_confluent_avro", permissive = true)))
  }
}
