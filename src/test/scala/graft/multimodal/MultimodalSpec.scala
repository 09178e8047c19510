package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.generate(spark, 90)

  test("generator is deterministic and schema-complete") {
    val a = Multimodal.generate(spark, 30).collect().map(_.media_id).toSeq
    val b = Multimodal.generate(spark, 30).repartition(7)
      .collect().map(_.media_id).toSeq.sorted
    assert(a.sorted == b)
    val df = media.toDF()
    assert(df.schema.fieldNames.toSet ==
      Multimodal.mediaSchema.fieldNames.toSet)
    assert(df.filter($"payload".isNull).count() == 0)
  }

  test("feature extraction: stable checksums, fixed-dim features") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.checksum).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(5)).collect()
      .map(f => f.media_id -> f.checksum).toMap
    assert(f1 == f2) // partition-layout independent
    val dims = Multimodal.extractFeatures(media)
      .collect().map(_.feature.length).distinct
    assert(dims.toSeq == Seq(Multimodal.StubCodec.FeatureDim))
  }

  test("features survive a parquet round-trip with binary + array columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    Multimodal.extractFeatures(media).write.mode("overwrite")
      .parquet(s"$dir/features")
    val back = spark.read.parquet(s"$dir/features")
    assert(back.count() == media.count())
    assert(back.schema("feature").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false) ||
      back.schema("feature").dataType.typeName == "array")
  }

  test("frame sampling yields bounded per-video frames") {
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    val perVideo = frames.groupBy($"media_id").count()
    assert(perVideo.filter($"count" > 4).count() == 0)
    assert(frames.filter(length($"frame_bytes") === 0).count() == 0)
  }

  test("resize plan: aspect preserved, never upscales") {
    val plan = Multimodal.resizePlan(media.toDF(), maxSide = 32)
    assert(plan.filter($"out_width" > 32 || $"out_height" > 32).count() == 0)
    assert(plan.filter($"scale" > 1.0).count() == 0)
  }
}
