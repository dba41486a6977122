package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGH"),
    (2L, "tiny")
  ).toDF("media_id", "payload")
    .select($"media_id", $"payload".cast("binary").as("content"))

  test("decode stub emits deterministic metadata with the declared schema") {
    val out = Multimodal.decode(media)
    assert(out.schema.fieldNames.contains("decoded"))
    val r = out.filter($"media_id" === 1L).select("decoded.*").collect()(0)
    // bytes 'a'(97), 'b'(98) -> 64 + (97%64)*16, 64 + (98%64)*16
    assert(r.getInt(0) == 64 + (97 % 64) * 16)
    assert(r.getInt(1) == 64 + (98 % 64) * 16)
    assert(r.getInt(2) == 44 * 10)
  }

  test("sampleFrames: stride slices, short payloads yield fewer frames") {
    val frames = Multimodal.sampleFrames(media, "media_id", "content", nFrames = 4, frameSize = 16)
      .withColumn("s", $"frame".cast("string"))
      .collect()
    val f1 = frames.filter(_.getLong(0) == 1L)
    assert(f1.length == 4)
    assert(f1.map(_.getAs[String]("s")).head == "abcdefghijklmnop") // offset 1
    // 4-byte payload cannot host a 16-byte frame
    assert(!frames.exists(_.getLong(0) == 2L))
  }

  test("StubCodec.features is a k-bucket byte histogram") {
    val f = Multimodal.StubCodec.features("aaab".getBytes, 4)
    assert(f.sum == 4f)
  }
}
