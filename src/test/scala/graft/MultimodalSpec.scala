package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.northstar.Multimodal

/** Multimodal binary-column plumbing over synthesized payloads. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def media = Multimodal.packFromText(
    Tables.read(spark, dir, "documents").limit(50), "doc_id", "text")

  test("pack produces binary payloads with typed metadata") {
    val rows = media.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.payload.nonEmpty))
    assert(rows.map(_.meta.kind).toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("feature extraction: histogram mass equals payload size, deterministic") {
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(f => f.byte_histogram.sum == f.n_bytes))
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("frame sampling yields n frames per payload") {
    val frames = Multimodal.sampleFrames(media.toDF(), n = 4, frameBytes = 8)
    val counts = frames.groupBy("media_id").count().collect()
    assert(counts.forall(_.getLong(1) == 4))
    assert(frames.schema("frame_bytes").dataType.typeName == "binary")
  }

  test("resize stub bounds payload size") {
    val resized = media.toDF().select(
      length(Multimodal.resizeStub(col("payload"), 16)).as("n")).collect()
    assert(resized.forall(_.getInt(0) <= 16))
  }

  test("resize stub preserves raw non-UTF8 bytes (no string round-trip)") {
    import spark.implicits._
    val raw = Array[Byte](0xFF.toByte, 0x00, 0xAB.toByte, 0x10, 0xC3.toByte, 0x28)
    val out = Seq(Tuple1(raw)).toDF("payload")
      .select(Multimodal.resizeStub(col("payload"), 3).as("r"))
      .head.getAs[Array[Byte]](0)
    // stride = 6/3 = 2 → bytes at positions 1,3,5 (1-based)
    assert(out.toSeq == Seq(0xFF.toByte, 0xAB.toByte, 0xC3.toByte))
  }
}
