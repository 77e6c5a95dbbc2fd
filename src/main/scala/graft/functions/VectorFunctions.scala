package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives (SURVEY.md §2.11) as pure Catalyst
  * higher-order-function expressions — no UDFs, no collect.
  *
  * Determinism across engines: all folds are explicit left-to-right
  * sequential aggregates over element indices, written with the same
  * formula in the DuckDB oracle (list_reduce over the same index order),
  * so double arithmetic is bit-identical. Final similarities are rounded
  * to 6 decimals on both sides before ordering/filtering.
  */
object VectorFunctions {

  val Dim = 64

  private def bridge = org.apache.spark.sql.GraftBridge

  /** Sequential dot product of two array<double> columns — a native
    * codegen'd Expression (one tight loop, zero allocation) computing the
    * identical index-order fold as `aggregate(zip_with(a, b, _*_), 0.0,
    * _+_)`, which remains the semantic definition. */
  def dot(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** Cosine similarity dot/(sqrt(dot_aa)*sqrt(dot_bb)) — one-pass native
    * Expression, bit-identical to the three-fold form (see CosineSim). */
  def cosine(a: Column, b: Column): Column =
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))

  /** DuckDB SQL for the same sequential dot product. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, $Dim), i -> $a[i] * $b[i]), (x, y) -> x + y)"

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** Deterministic pseudo-random hyperplanes for sign-LSH, from a fixed
    * LCG; 3-decimal values so the literals parse to identical doubles in
    * both engines. Single source of truth for the Spark and SQL sides. */
  def hyperplanes(nPlanes: Int, dim: Int = Dim): Array[Array[Double]] = {
    var state = 42L
    def next(): Double = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      (((state >>> 33) % 2001) - 1000) / 1000.0
    }
    Array.fill(nPlanes)(Array.fill(dim)(next()))
  }

  def planeLit(plane: Array[Double]): Column =
    array(plane.toIndexedSeq.map(lit(_)): _*)

  def planeSql(plane: Array[Double]): String =
    plane.mkString("([", ", ", "]::DOUBLE[])")

  /** Sign-LSH bucket id: bit p set iff dot(v, plane_p) >= 0. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, planeLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(vExpr: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotSql(vExpr, planeSql(p))} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
