package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** The bloom semi-join reduction's contract: zero false negatives (every
  * build-side key passes the probe filter), real selectivity (non-keys
  * are mostly removed), and end-to-end join equivalence.
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val M = 4096
  private val K = 3

  test("no false negatives: every build key survives the probe filter") {
    val keys = (0L until 100L).toDF("k")
    val mask = BloomJoin.buildMask(keys, "k", M, K)
    val survived = BloomJoin.probeFilter(keys, "k", mask, M, K).count()
    assert(survived == 100L)
  }

  test("selectivity: a 10%-match probe side shrinks close to the match rate") {
    val build = (0L until 100L).toDF("k")
    val probe = (0L until 1000L).toDF("k")
    val mask = BloomJoin.buildMask(build, "k", M, K)
    val survived = BloomJoin.probeFilter(probe, "k", mask, M, K).count()
    // 100 true keys always pass; with ~300/4096 bits set, the false-
    // positive rate is ~(300/4096)^3 ≈ 4e-4 — allow generous slack
    assert(survived >= 100L && survived <= 130L, s"survived=$survived")
  }

  test("join equivalence: bloom-prefiltered join == plain join") {
    val build = (0L until 50L).map(i => (i * 7 % 200, s"d$i")).toDF("k", "attr")
    val probe = (0L until 2000L).map(i => (i % 300, i)).toDF("k", "v")
    val mask = BloomJoin.buildMask(build.select("k"), "k", M, K)
    val plain = probe.join(build, "k")
    val bloomed = BloomJoin.probeFilter(probe, "k", mask, M, K).join(build, "k")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("null probe keys are dropped, matching inner-join semantics") {
    val build = Seq(1L, 2L).toDF("k")
    val mask = BloomJoin.buildMask(build, "k", M, K)
    val probe = Seq(Some(1L), None, Some(99L)).toDF("k")
    val got = BloomJoin.probeFilter(probe, "k", mask, M, K)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("null build keys are ignored, not a crash; non-null keys still pass") {
    val build = Seq(Some(1L), None, Some(2L)).toDF("k")
    val mask = BloomJoin.buildMask(build, "k", M, K) // NPE before the fix
    val probe = Seq(Some(1L), Some(2L), None, Some(99L)).toDF("k")
    val got = BloomJoin.probeFilter(probe, "k", mask, M, K)
      .collect().map(_.getLong(0)).toSet
    // both real keys pass; the null probe row is dropped (no null in the
    // collected longs); 99 may rarely false-positive — that is the bloom
    // contract, removed by the downstream exact join
    assert(Set(1L, 2L).subsetOf(got) && got.subsetOf(Set(1L, 2L, 99L)))
  }
}
