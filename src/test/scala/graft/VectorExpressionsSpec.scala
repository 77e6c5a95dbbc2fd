package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

/** Native vector expressions: DotProduct/CosineSim must be bit-identical
  * to the higher-order-function folds they replace (same index-order
  * accumulation), on both execution paths — codegen'd projection and
  * interpreted-inside-lambda. */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lambdaDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def lambdaCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    lambdaDot(a, b) / (sqrt(lambdaDot(a, a)) * sqrt(lambdaDot(b, b)))

  private lazy val vecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    .limit(64)

  test("dot/cosine are bit-identical to the fold form in a projection") {
    val q = vecs.orderBy("vec_id").limit(1)
      .select(col("e").as("q")).crossJoin(vecs)
    val mismatches = q.select(
      VectorFunctions.dot(col("e"), col("q")).as("nd"),
      lambdaDot(col("e"), col("q")).as("ld"),
      VectorFunctions.cosine(col("e"), col("q")).as("nc"),
      lambdaCos(col("e"), col("q")).as("lc"))
      .filter(col("nd") =!= col("ld") || col("nc") =!= col("lc"))
      .count()
    assert(mismatches == 0)
  }

  test("cosine inside a transform lambda (interpreted path) matches") {
    // the packed-centroid assignment shape: cosine over lambda variables
    val packed = vecs.limit(4)
      .agg(collect_list(struct(col("vec_id"), col("e"))).as("cents"))
    val out = vecs.crossJoin(packed)
      .select(col("vec_id"),
        transform(col("cents"), c =>
          VectorFunctions.cosine(col("e"), c("e"))).as("nsims"),
        transform(col("cents"), c => lambdaCos(col("e"), c("e"))).as("lsims"))
      .filter(col("nsims") =!= col("lsims"))
      .count()
    assert(out == 0)
  }

  test("dot against a literal plane matches (LSH bucket path)") {
    val plane = VectorFunctions.hyperplanes(1).head
    val bad = vecs.select(
      VectorFunctions.dot(col("e"), VectorFunctions.planeLit(plane)).as("nd"),
      lambdaDot(col("e"), VectorFunctions.planeLit(plane)).as("ld"))
      .filter(col("nd") =!= col("ld")).count()
    assert(bad == 0)
  }

  test("L2Sq is bit-identical to the zipped (x-y)^2 fold, both execution paths") {
    val br = org.apache.spark.sql.GraftBridge
    def nativeL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      br.column(graft.functions.L2Sq(br.expression(a), br.expression(b)))
    def lambdaL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
        (acc, x) => acc + x)
    // codegen'd projection path
    val q = vecs.orderBy("vec_id").limit(1)
      .select(col("e").as("q")).crossJoin(vecs)
    val bad = q.select(nativeL2(col("e"), col("q")).as("n"),
        lambdaL2(col("e"), col("q")).as("l"))
      .filter(col("n") =!= col("l")).count()
    assert(bad == 0)
    // interpreted-inside-lambda path (the packed-centroid assignment shape)
    val packed = vecs.limit(4)
      .agg(collect_list(struct(col("vec_id"), col("e"))).as("cents"))
    val bad2 = vecs.crossJoin(packed)
      .select(
        transform(col("cents"), c => nativeL2(col("e"), c("e"))).as("nd"),
        transform(col("cents"), c => lambdaL2(col("e"), c("e"))).as("ld"))
      .filter(col("nd") =!= col("ld")).count()
    assert(bad2 == 0)
  }
}
