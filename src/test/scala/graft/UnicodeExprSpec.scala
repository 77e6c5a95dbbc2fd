package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions.nfc

/** NfcNormalize: canonical composition per the Unicode standard —
  * decomposed sequences fold to their composed forms, ASCII passes
  * through untouched, the fold is idempotent, and nulls stay null. Both
  * the codegen path (column over a DataFrame) and the interpreted path
  * (constant folding evaluates eval()) are exercised. All non-ASCII
  * characters are written as explicit \\u escapes so composed vs
  * decomposed inputs are unambiguous in source. */
class UnicodeExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // decomposed: base letter + combining mark; composed: the NFC target
  private val eAcuteD = "e\u0301"; private val eAcuteC = "\u00e9"
  private val oUmlD = "o\u0308";   private val oUmlC = "\u00f6"

  test("decomposed sequences fold to composed forms (codegen path)") {
    import spark.implicits._
    val out = Seq(eAcuteD, oUmlD, "ascii only", s"caf$eAcuteD")
      .toDF("s")
      .select(nfc(col("s")).as("n")).as[String].collect().toSeq
    assert(out == Seq(eAcuteC, oUmlC, "ascii only", s"caf$eAcuteC"))
  }

  test("constant folding (interpreted eval) matches the codegen result") {
    import spark.implicits._
    val folded = spark.range(1)
      .select(nfc(lit(eAcuteD + oUmlD)).as("n")).as[String].head()
    assert(folded == eAcuteC + oUmlC)
    // the literal plan must have constant-folded: no expression at runtime
    val p = spark.range(1).select(nfc(lit(eAcuteD)).as("n"))
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("nfc_normalize"), p)
  }

  test("idempotent: normalizing twice equals normalizing once") {
    import spark.implicits._
    val docs = Seq(s"$eAcuteD mixed $eAcuteC text", "plain").toDF("s")
    val bad = docs
      .select(nfc(col("s")).as("once"), nfc(nfc(col("s"))).as("twice"))
      .filter(col("once") =!= col("twice")).count()
    assert(bad == 0)
  }

  test("null stays null; character count shrinks by the marks folded") {
    import spark.implicits._
    val rows = Seq(Some("a" + eAcuteD), None).toDF("s")
      .select(nfc(col("s")).as("n"), length(nfc(col("s"))).as("len"))
      .collect()
    assert(rows.exists(r => !r.isNullAt(0) && r.getString(0) == "a" + eAcuteC
      && r.getInt(1) == 2))
    assert(rows.exists(_.isNullAt(0)))
  }

  test("non-string input is rejected at analysis") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1).toDF("i").select(nfc(col("i"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string")
      || e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
  }
}
