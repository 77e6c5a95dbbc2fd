package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.functions.TextFunctions.hexSpanValSql

/** Integration: the full curation chain a training-data pipeline runs —
  * exact dedup → quality filter → per-source quota → content-hash split —
  * composed from the public operator APIs over the documents table, with
  * row accounting asserted at every stage (each stage only narrows) and
  * the decontamination property checked end-to-end (identical texts land
  * in identical splits even across different doc ids). */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("dedup → quality → quota → split composes with sound row accounting") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count()

    // 1. exact dedup, deterministic keeper
    val keepers = Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keepers, "doc_id")
    val nDeduped = deduped.count()
    assert(nDeduped <= total && nDeduped > 0)
    assert(deduped.select(md5(col("text"))).distinct().count() == nDeduped)

    // 2. quality floor: token count within sane bounds
    val scored = deduped.withColumn("n_tokens", size(split(col("text"), " ")))
    val quality = scored.filter(col("n_tokens") >= 5)
    val nQuality = quality.count()
    assert(nQuality <= nDeduped)

    // 3. per-source quota (cap 100 by length then id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    val quota = quality.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 100).drop("rk")
    val nQuota = quota.count()
    assert(nQuota <= nQuality)
    val overCap = quota.groupBy("source").count().filter(col("count") > 100).count()
    assert(overCap == 0)

    // 4. content-hash split: 80/10/10 by md5 bucket, content-deterministic
    val bucket = expr(s"(${hexSpanValSql("md5(text)", 0, 6)} % 100)")
    val split80 = quota.withColumn("split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
    assert(split80.count() == nQuota)
    // decontamination: same text ⇒ same split, regardless of id/source
    val conflicting = split80.groupBy(md5(col("text")))
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(conflicting == 0)
    // all three splits materialize on this corpus
    assert(split80.select("split").distinct().count() == 3)
  }
}
