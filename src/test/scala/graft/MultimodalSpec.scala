package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal plumbing: schema, batch shape, deterministic stub decode,
  * frame sampling (SURVEY.md §2.11). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("media frame carries opaque binary payloads with typed metadata") {
    val items = Multimodal.fromDocuments(spark, sfDir)
    val schema = items.schema
    assert(schema("payload").dataType.typeName == "binary")
    val first = items.head()
    assert(first.payload.length == first.n_bytes)
    assert(Set("image", "audio", "video", "text").contains(first.media_type))
  }

  test("feature extraction is deterministic and preserves row count") {
    val items = Multimodal.fromDocuments(spark, sfDir)
    val f1 = Multimodal.extractFeatures(items).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(items).collect().sortBy(_.media_id)
    assert(f1.length == items.count())
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(f => f.width >= 1 && f.width <= 1920))
    assert(f1.forall(f => f.media_type != "image" || f.duration_ms == 0))
  }

  test("binaryFile ingest maps blob files to the media frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blobs")
    java.nio.file.Files.write(dir.resolve("a.jpg"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.wav"), Array[Byte](4, 5))
    java.nio.file.Files.write(dir.resolve("c.txt"), "hi".getBytes)
    val items = Multimodal.fromBinaryFiles(spark, dir.toString + "/*")
      .collect().sortBy(_.source)
    assert(items.length == 3)
    assert(items.map(_.media_type).toSeq == Seq("image", "audio", "text"))
    assert(items.forall(m => m.payload.length.toLong == m.n_bytes))
    assert(items.map(_.media_id).distinct.length == 3)
    // the frame feeds the same feature pipeline as any other source
    import spark.implicits._
    val feats = Multimodal.extractFeatures(
      Multimodal.fromBinaryFiles(spark, dir.toString + "/*")).collect()
    assert(feats.length == 3 && feats.forall(_.width >= 1))
  }

  test("stub resize shrinks payloads deterministically, no shuffle") {
    val items = Multimodal.fromDocuments(spark, sfDir)
    val r1 = Multimodal.resize(items, 64, 64).collect().sortBy(_.media_id)
    val r2 = Multimodal.resize(items, 64, 64).collect().sortBy(_.media_id)
    assert(r1.length == items.count())
    assert(r1.map(_.payload.toSeq).toSeq == r2.map(_.payload.toSeq).toSeq)
    val orig = items.collect().map(m => m.media_id -> m.payload.length).toMap
    assert(r1.forall(r => r.n_bytes <= orig(r.media_id) && r.n_bytes > 0))
    assert(r1.forall(r => r.target_w == 64 && r.target_h == 64))
    // narrow plan: no Exchange
    val plan = Multimodal.resize(items, 64, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("frame sampling emits k deterministic offsets per video item") {
    val items = Multimodal.fromDocuments(spark, sfDir)
    val frames = Multimodal.sampleFrames(items, 4)
    val nVideos = items.filter(_.media_type == "video").count()
    assert(frames.count() == nVideos * 4)
    import org.apache.spark.sql.functions._
    val bad = frames.groupBy("media_id")
      .agg(countDistinct("frame_idx").as("n"))
      .filter(col("n") =!= 4).count()
    assert(bad == 0)
  }
}
