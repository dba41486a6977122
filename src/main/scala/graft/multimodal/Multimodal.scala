package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct.
  *
  * The Spark-side mechanics — schema, partition-preserving batch
  * iteration, frame sampling, feature extraction shape — are real and
  * tested. The actual codec step is STUBBED (no image/audio libraries in
  * this environment) behind [[StubCodec]]: a deterministic fake that
  * derives "decoded" metadata from the payload bytes, so tests are
  * reproducible and the plumbing is exercised end-to-end. Swap
  * [[StubCodec]] for a real JNI/javacv codec without touching anything
  * else.
  *
  * Scale notes: the codec step runs via `Dataset.mapPartitions` (one
  * codec init per partition, not per row — the same batching rationale
  * as Arrow-batch UDFs), NOT an `.rdd` hop: the typed hop keeps the
  * whole operator inside one Catalyst plan, so the op-internal
  * projection to (id, content) reaches the parquet scan as ReadSchema —
  * a media table that grows metadata columns never pays their I/O here
  * (spec-pinned in MultimodalSpec). Frame sampling multiplies rows via
  * `posexplode` *after* predicate pushdown has had its chance at the
  * scan.
  */
object Multimodal {

  /** Typed metadata accompanying every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType),
      StructField("width", IntegerType),     // images/video
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType)))))) // audio/video

  /** STUB codec — deterministic fake "decode".
    *
    * A real deployment replaces this object with bindings to an image/
    * audio library; the function signatures are the contract. The fake
    * derives plausible metadata purely from payload bytes so results
    * are stable across engines and runs.
    */
  object StubCodec {
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      val b0 = if (n > 0) payload(0) & 0xff else 0
      val b1 = if (n > 1) payload(1) & 0xff else 0
      // fake width/height/duration, deterministic in the bytes
      (64 + (b0 % 64) * 16, 64 + (b1 % 64) * 16, n * 10)
    }

    /** Fake feature vector: k bucketed byte-histogram counts. */
    def features(payload: Array[Byte], k: Int): Array[Float] = {
      val acc = new Array[Float](k)
      var i = 0
      while (i < payload.length) { acc((payload(i) & 0xff) % k) += 1f; i += 1 }
      acc
    }

    /** Fake resize: keep every stride-th byte so the payload lands at or
      * under `targetBytes` (stride = ceil(n/target)) — the downsample
      * shape of an image resize, deterministic in the bytes.
      */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
      val n = payload.length
      if (n <= targetBytes) payload
      else {
        val stride = ((n + targetBytes - 1) / targetBytes).max(1)
        val out = new Array[Byte]((n + stride - 1) / stride)
        var i = 0
        while (i * stride < n) { out(i) = payload(i * stride); i += 1 }
        out
      }
    }
  }

  /** Decode pass: binary content → metadata struct, batched per
    * partition. Output schema is explicit so downstream plans bind
    * without inference. Pass-through contract: `decoded` is appended to
    * whatever columns arrive, so the CALLER's projection decides what
    * the scan reads — project before decoding a wide table.
    */
  def decode(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("duration_ms", IntegerType)))))
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      // codec init would happen here, once per partition
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](contentIdx)
        val (w, h, dur) = StubCodec.decodeMeta(if (payload == null) Array.emptyByteArray else payload)
        Row.fromSeq(row.toSeq :+ Row(w, h, dur))
      }
    }(Encoders.row(outSchema))
  }

  /** Feature-extraction pass: binary content → dense `array<float>`,
    * batched per partition (codec init once per partition). The stub
    * emits the byte-histogram fake; a real deployment swaps in an
    * embedding model's forward pass with the same batch shape. Only
    * (id, content) enter the per-partition hop — the projection is part
    * of this plan, so parquet reads exactly two columns however wide
    * the media table is.
    */
  def extractFeatures(media: DataFrame, idCol: String, contentCol: String,
                      k: Int): DataFrame = {
    val outSchema = StructType(Seq(
      media.schema(idCol),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    media.select(col(idCol), col(contentCol)).mapPartitions { rows =>
      // model/codec init would happen here, once per partition
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](1)
        Row(row.get(0),
          StubCodec.features(if (payload == null) Array.emptyByteArray else payload, k).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize pass: binary content → smaller binary content (≤ target
    * bytes), batched per partition. Keeps the id column plus the
    * resized payload; same pruned two-column hop as [[extractFeatures]].
    */
  def resize(media: DataFrame, idCol: String, contentCol: String,
             targetBytes: Int): DataFrame = {
    val outSchema = StructType(Seq(
      media.schema(idCol),
      StructField("resized", BinaryType)))
    media.select(col(idCol), col(contentCol)).mapPartitions { rows =>
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](1)
        Row(row.get(0),
          StubCodec.resize(if (payload == null) Array.emptyByteArray else payload, targetBytes))
      }
    }(Encoders.row(outSchema))
  }

  /** Sample up to nFrames fixed-stride "frames" (byte slices) per
    * payload — the video-keyframe shape: one input row fans out to
    * (media_id, frame_idx, frame_bytes).
    */
  def sampleFrames(media: DataFrame, idCol: String, contentCol: String,
                   nFrames: Int, frameSize: Int): DataFrame = {
    val n = col("__nb")
    // explicit floor: Spark's double->int cast truncates while other
    // engines round, so keep the division semantics unambiguous
    val stride = greatest(
      floor((n - frameSize).cast(IntegerType) / lit(math.max(nFrames - 1, 1))).cast(IntegerType),
      lit(1))
    media
      .withColumn("__nb", length(col(contentCol)))
      .withColumn("__offsets",
        filter(
          transform(sequence(lit(0), lit(nFrames - 1)), i => (i * stride) + 1),
          o => o + frameSize - 1 <= n))
      .select(col(idCol), col(contentCol),
        posexplode(col("__offsets")).as(Seq("frame_idx", "__off")))
      .select(col(idCol), col("frame_idx"),
        expr(s"substring($contentCol, __off, $frameSize)").as("frame"))
  }
}
