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

  test("extractFeatures: dense k-vector per row, mass equals payload bytes") {
    val out = Multimodal.extractFeatures(media, "media_id", "content", k = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L).length == 8 && out(1L).sum == 44f)
    assert(out(2L).length == 8 && out(2L).sum == 4f)
  }

  test("resize: stride-downsamples to at most target bytes, short payloads pass through") {
    val out = Multimodal.resize(media, "media_id", "content", targetBytes = 16)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("resized")).toMap
    // 45 bytes, stride ceil(45/16)=3 -> bytes at 0,3,6,... = 15 bytes
    assert(out(1L).length == 15)
    assert(new String(out(1L)).startsWith("adgj"))
    assert(new String(out(2L)) == "tiny") // already under target
  }

  test("the codec hop stays in one plan and prunes a wide table's scan to id+content") {
    // the mapPartitions codec seam must NOT be an .rdd hop: with a typed
    // hop the op-internal (id, content) projection reaches the parquet
    // scan as ReadSchema, so a media table that grows metadata columns
    // (here documents.parquet: 5 columns) never pays their I/O
    val dir = java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet")
    assume(java.nio.file.Files.exists(dir), "driver testdata not present")
    val wide = spark.read.parquet(dir.toString)
    assert(wide.schema.fieldNames.length > 2, "fixture must be wider than the hop")
    for (op <- Seq(
        Multimodal.extractFeatures(wide, "doc_id", "text", k = 4),
        Multimodal.resize(wide, "doc_id", "text", targetBytes = 16))) {
      val scans = op.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected the parquet scan inside the op's own plan")
      assert(scans.head.requiredSchema.fieldNames.toSet == Set("doc_id", "text"),
        s"scan reads ${scans.head.requiredSchema.fieldNames.mkString(",")} — pruning defeated")
    }
  }
}
