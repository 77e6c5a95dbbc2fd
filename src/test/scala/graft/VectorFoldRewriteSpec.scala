package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.VectorFoldRewrite

/** The §2.9 ladder's Rule[LogicalPlan] rung: the canonical HOF dot
  * product rewrites to the native vec_dot kernel — value-identical on
  * the contract shape, semantics-preserving (NULL) off it, and
  * conservative everywhere else. Registered runtime-style here (the
  * GraftBridge experimental path); production wiring is
  * GraftExtensions.injectOptimizerRule. */
class VectorFoldRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val FoldSql =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"

  private def withRule[T](body: => T): T = {
    org.apache.spark.sql.GraftBridge.registerOptimizerRule(spark, VectorFoldRewrite)
    try body
    finally org.apache.spark.sql.GraftBridge
      .unregisterOptimizerRule(spark, VectorFoldRewrite)
  }

  /** Built over range() with a non-foldable element (id·0) so
    * ConvertToLocalRelation cannot evaluate the whole plan away before
    * the rewrite is observable. */
  private def vectors = spark.range(2).select(
    array(lit(1.5) + col("id").cast("double") * 0, lit(-2.0), lit(3.25)).as("a"),
    array(lit(0.5), lit(4.0), lit(-1.0)).as("b"))

  test("canonical fold rewrites to vec_dot and keeps the exact values") {
    withRule {
      val df = vectors.select(expr(FoldSql).as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("vec_dot"), optimized)
      val got = df.collect().map(_.getDouble(0)).toSeq
      val want = vectors
        .select(graft.functions.VectorFunctions.dot(col("a"), col("b")).as("d"))
        .collect().map(_.getDouble(0)).toSeq
      val expected = 1.5 * 0.5 + -2.0 * 4.0 + 3.25 * -1.0
      assert(got == want && want == Seq(expected, expected))
    }
  }

  test("operand order in the multiply does not matter (IEEE * is bitwise commutative)") {
    withRule {
      val df = vectors.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> y * x), cast(0 as double), (acc, v) -> v + acc)").as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      assert(df.collect().map(_.getDouble(0)).head == 1.5 * 0.5 + -2.0 * 4.0 + 3.25 * -1.0)
    }
  }

  test("ragged lengths produce NULL — identical to the un-rewritten fold") {
    def run() = spark.range(1)
      .select(expr("array(1.0d, 2.0d)").as("a"), expr("array(3.0d)").as("b"))
      .select(expr(FoldSql).as("d")).collect().head.isNullAt(0)
    val without = run()
    val withR = withRule(run())
    assert(without && withR, s"ragged fold must be NULL (plain=$without rewritten=$withR)")
  }

  test("guards: element-nullable arrays, non-identity finish, non-zero seed do not fire") {
    withRule {
      // containsNull = true (null element literal) → kernel can't read it
      val nullable = spark.range(1)
        .select(expr("array(1.0d, cast(null as double))").as("a"),
          expr("array(1.0d, 2.0d)").as("b"))
        .select(expr(FoldSql).as("d"))
      assert(!nullable.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      assert(nullable.collect().head.isNullAt(0)) // null element poisons the fold
      // finish lambda that is not the identity
      val finish = vectors.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v, acc -> acc * 2.0d)").as("d"))
      assert(!finish.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      // a non-+0.0 seed changes the empty/degenerate sum bits
      val seeded = vectors.select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), cast(1 as double), (acc, v) -> acc + v)").as("d"))
      assert(!seeded.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    }
  }

  test("rewritten and un-rewritten folds agree bit-for-bit over 100 derived vectors") {
    // Arrays derived from the row id (non-foldable, varied magnitudes &
    // signs); the rewritten plan must reproduce the lambda fold's
    // doubles EXACTLY — any reordering of the index-order additions
    // would surface here as a last-ulp diff
    // only +/−/× of non-nullable inputs: a / or % would mark the
    // elements nullable (divide-by-zero → null) and correctly block the
    // rewrite's containsNull=false guard
    def df = spark.range(100).select(
      array((0 until 8).map(i =>
        (col("id") * (i + 3) - lit(350)).cast("double") * 0.25): _*).as("a"),
      array((0 until 8).map(i =>
        (col("id") * (i + 5) - lit(410)).cast("double") * 0.125): _*).as("b"))
      .select(col("a"), col("b"), expr(FoldSql).as("d"))
    val plain = df.collect().map(_.getDouble(2)).toSeq
    val rewritten = withRule {
      val r = df
      assert(r.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      r.collect().map(_.getDouble(2)).toSeq
    }
    assert(plain == rewritten && plain.distinct.size > 1)
  }

  test("spark.graft.rewriteVectorFolds=false disables the rule") {
    withRule {
      spark.conf.set("spark.graft.rewriteVectorFolds", "false")
      try {
        val df = vectors.select(expr(FoldSql).as("d"))
        assert(!df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      } finally spark.conf.unset("spark.graft.rewriteVectorFolds")
    }
  }
}
