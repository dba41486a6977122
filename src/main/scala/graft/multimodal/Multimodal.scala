package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct.
  *
  * The Spark-side mechanics — schema, partition-preserving batch
  * iteration, frame sampling, feature extraction shape — are real and
  * tested. The codec step is a SEAM ([[MediaCodec]]) with two
  * implementations: [[StubCodec]], a deterministic byte-math fake the
  * DuckDB oracle can reproduce (the default — it keeps every query
  * hash-checkable), and [[ImageIoCodec]], a REAL PNG/BMP/GIF/JPEG
  * decoder over the JDK's javax.imageio, spec-pinned on fixture images
  * (ImageIoSpec). Audio/video codecs would be further implementations
  * of the same seam (no such library ships in this JVM).
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

  /** The codec SEAM: everything the per-partition media hop needs from a
    * decoder. Implementations must be serializable (the object ships in
    * the task closure); `init()` runs once per partition before the
    * first row — the place for native-library/model warm-up.
    */
  trait MediaCodec extends Serializable {
    def init(): Unit = ()
    /** payload → (width, height, duration_ms); (-1, -1, -1) = undecodable */
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int)
    /** payload → dense k-dim feature vector */
    def features(payload: Array[Byte], k: Int): Array[Float]
    /** payload → reduced payload bounded by `targetBytes` */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte]
  }

  /** STUB codec — deterministic fake "decode" (the default).
    *
    * The fake derives plausible metadata purely from payload bytes so
    * results are stable across engines and runs — which is what lets
    * the oracle queries verify the PLUMBING byte-for-byte in DuckDB.
    * [[ImageIoCodec]] is the real-decode implementation of the same
    * seam for actual image payloads.
    */
  object StubCodec extends MediaCodec {
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

  /** REAL image codec over the JDK's `javax.imageio` (PNG/BMP/GIF/JPEG —
    * whatever readers the running JVM registers). Same seam as
    * [[StubCodec]]; plug it into [[decode]]/[[extractFeatures]]/
    * [[resize]] for genuine pixel work with the identical Spark plan,
    * partitioning, and batch shape. The oracle queries keep the stub
    * (DuckDB cannot decode pixels); ImageIoSpec pins this codec's
    * behavior on fixture images instead.
    *
    * Decoding happens entirely inside the executor task — payload bytes
    * in, small struct/vector out — so nothing about the 100 TB posture
    * changes: one codec init per partition, pruned (id, content)
    * columns through the hop, no driver involvement.
    */
  object ImageIoCodec extends MediaCodec {
    override def init(): Unit = {
      // executors have no display; ImageIO's disk cache would add a
      // file-system round-trip per decode on pure in-memory payloads
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
    }

    private def read(payload: Array[Byte]): java.awt.image.BufferedImage =
      if (payload == null || payload.length == 0) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }

    /** (width, height, 0) for a decodable image; (-1, -1, -1) otherwise
      * (a still image has no duration; the sentinel keeps undecodable
      * rows visible instead of faking zeros a filter could mistake for
      * a 0×0 image).
      */
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int) = {
      val img = read(payload)
      if (img == null) (-1, -1, -1) else (img.getWidth, img.getHeight, 0)
    }

    /** k-bin luminance histogram over decoded pixels (integer ITU-R 601
      * luma approximation (77R + 150G + 29B) >> 8 — deterministic, no
      * float rounding); zeros when undecodable.
      */
    def features(payload: Array[Byte], k: Int): Array[Float] = {
      val acc = new Array[Float](k)
      val img = read(payload)
      if (img != null) {
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val luma = (((rgb >> 16 & 0xff) * 77 + (rgb >> 8 & 0xff) * 150 +
              (rgb & 0xff) * 29) >> 8).min(255)
            acc(luma * k / 256) += 1f
            x += 1
          }
          y += 1
        }
      }
      acc
    }

    /** Real downscale-and-reencode: shrink so the PIXEL COUNT fits
      * `targetBytes` (the seam's size budget, read as an uncompressed-
      * payload proxy — encoded size isn't knowable before encoding),
      * nearest-neighbor sampling (deterministic — Graphics2D
      * interpolation varies by JVM), PNG out. Payloads already within
      * budget, or undecodable ones, pass through unchanged.
      */
    def resize(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
      val img = read(payload)
      if (img == null || img.getWidth.toLong * img.getHeight <= targetBytes) payload
      else {
        val scale = math.sqrt(targetBytes.toDouble / (img.getWidth.toLong * img.getHeight))
        val w = math.max(1, (img.getWidth * scale).toInt)
        val h = math.max(1, (img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out.setRGB(x, y, img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
            x += 1
          }
          y += 1
        }
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", buf)
        buf.toByteArray
      }
    }
  }

  /** Decode pass: binary content → metadata struct, batched per
    * partition. Output schema is explicit so downstream plans bind
    * without inference. Pass-through contract: `decoded` is appended to
    * whatever columns arrive, so the CALLER's projection decides what
    * the scan reads — project before decoding a wide table.
    */
  def decode(media: DataFrame, codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("duration_ms", IntegerType)))))
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      codec.init() // once per partition
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](contentIdx)
        val (w, h, dur) = codec.decodeMeta(if (payload == null) Array.emptyByteArray else payload)
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
                      k: Int, codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      media.schema(idCol),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    media.select(col(idCol), col(contentCol)).mapPartitions { rows =>
      codec.init() // model/codec warm-up, once per partition
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](1)
        Row(row.get(0),
          codec.features(if (payload == null) Array.emptyByteArray else payload, k).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize pass: binary content → smaller binary content (≤ target
    * bytes), batched per partition. Keeps the id column plus the
    * resized payload; same pruned two-column hop as [[extractFeatures]].
    */
  def resize(media: DataFrame, idCol: String, contentCol: String,
             targetBytes: Int, codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      media.schema(idCol),
      StructField("resized", BinaryType)))
    media.select(col(idCol), col(contentCol)).mapPartitions { rows =>
      codec.init() // once per partition
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](1)
        Row(row.get(0),
          codec.resize(if (payload == null) Array.emptyByteArray else payload, targetBytes))
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
