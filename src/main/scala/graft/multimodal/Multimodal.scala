package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: media ride as opaque
  * `binary` columns next to a typed metadata struct, and per-modality
  * compute runs as batched per-partition passes.
  *
  * Absent from the reference (text-only); required by the 100 TB
  * training-data brief. Design decisions that matter at scale:
  *
  *  - **Opaque bytes + typed meta.** Parquet stores the blob pages
  *    column-separated from the metadata, so `WHERE meta.width > 512`
  *    prunes pages without touching a single media byte (filter pushdown
  *    on the struct fields; verify with `.explain` → PushedFilters).
  *  - **Batched decode.** [[extractFeatures]] and [[decodeImages]] are
  *    `mapPartitions` passes: per-partition codec initialization
  *    amortized over the batch — the Scala twin of a Pandas UDF over
  *    `mapInPandas` on PySpark (same batch shape, same schema
  *    contract). IMAGE DECODE IS REAL ([[ImageCodec]], JDK ImageIO —
  *    PNG encode on the fixture side, pixel-exact decode on the query
  *    side, oracle-checked in `q_image_decode`). AUDIO DECODE IS REAL
  *    ([[AudioCodec]], `javax.sound.sampled` — WAV/PCM encode on the
  *    fixture side, sample-exact decode on the query side,
  *    oracle-checked in `q_audio_decode`). VIDEO DECODE IS REAL
  *    ([[VideoCodec]], multi-frame GIF via JDK ImageIO — palette-exact
  *    animated-GIF encode on the fixture side, frame-sampled decode on
  *    the query side, oracle-checked in `q_video_decode`). IMAGE
  *    RESIZE IS REAL ([[ImageCodec.resizeNearest]] — explicit
  *    nearest-neighbor resampling, decode→resample→re-encode,
  *    oracle-checked end-to-end in `q_image_resize`). The LEARNED
  *    EMBEDDING is a real inference shape ([[EmbedKernel]] — hashed
  *    3-gram integer projection, oracle-checked in `q_embed_infer`).
  *    Remaining stand-ins: the byte-histogram [[MediaCodec]] (generic
  *    featurizer), the generic [[resizeStub]] for non-image media, and
  *    the prefix-slice audio resample (a float-lerp kernel would
  *    reintroduce exactly the cross-engine rounding class the µ-unit
  *    work eliminated — deliberately out of contract).
  *  - **Never collect blobs.** All media paths are executor-side; the
  *    driver only ever sees metadata.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("format", StringType)))

  /** The stubbed per-blob compute. Deterministic: a 16-bin byte-value
    * histogram normalized to sum 1 — engine-independent and cheap, with
    * exactly the signature a real decode-and-embed kernel would have. */
  object MediaCodec {
    val bins = 16
    def features(bytes: Array[Byte]): Array[Float] = {
      val h = new Array[Float](bins)
      if (bytes == null || bytes.isEmpty) return h
      var i = 0
      while (i < bytes.length) {
        h((bytes(i) & 0xFF) / (256 / bins)) += 1f
        i += 1
      }
      var b = 0
      while (b < bins) { h(b) /= bytes.length; b += 1 }
      h
    }
  }

  /** Deterministic media table derived from `documents` (S6-parity
    * fixture generator, pure expressions — distributed, no driver
    * loop): blob = UTF-8 bytes of the text, kind/meta arithmetic on
    * doc_id. */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(
      id.as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(id, lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        (pmod(id, lit(4)) * 256 + 256).cast("int").as("width"),
        (pmod(id, lit(3)) * 256 + 256).cast("int").as("height"),
        (pmod(id, lit(2)) * 22050 + 22050).cast("int").as("sample_rate"),
        (pmod(id, lit(7)) * 1000 + 1000).cast("long").as("duration_ms"),
        element_at(typedLit(Seq("png", "wav", "mp4")),
          (pmod(id, lit(3)) + 1).cast("int")).as("format")).as("meta"))
  }

  /** Batched feature extraction: adds `features array<float>`. Schema
    * contract mirrors a `mapInPandas` signature: input schema + the
    * feature column, batch-iterated per partition. */
  def extractFeatures(df: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      // Per-partition codec init would go here (amortized, ≙ the
      // per-batch model load in a Pandas UDF).
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        Row.fromSeq(row.toSeq :+ MediaCodec.features(bytes).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** LEARNED-EMBEDDING inference kernel — the hashing-trick linear
    * projection (feature hashing, Weinberger et al. 2009; the fastText
    * n-gram embedding shape): the blob's character 3-grams hash to
    * buckets, each bucket carries an 8-dim integer weight row DERIVED
    * FROM THE HASH (56 of hash60's 60 bits, 7 bits/dim, centered on
    * 0 — a frozen random projection, the standard stand-in for learned
    * weights when no trained matrix ships), and the embedding is the
    * per-dim weight sum over all grams. This replaces the round-10
    * byte-histogram stand-in with a REAL inference shape: tokenizer →
    * hashed lookup → accumulate, integer arithmetic end-to-end so
    * DuckDB mirrors every component exactly (hash60 is the engine's
    * mirrored hash). The batch plumbing is [[inferEmbedding]]'s
    * mapPartitions pass — per-partition "model load" (the digest
    * instance), per-row inference, exactly the Pandas-UDF batch shape
    * a torch encoder would use. */
  object EmbedKernel {
    val dim = 8

    /** JVM twin of `TextFunctions.hash60` (first 15 hex chars of md5
      * as a 60-bit long) for kernel-side use — one digest instance per
      * partition, reset per call. */
    final class Hasher {
      private val md = java.security.MessageDigest.getInstance("MD5")
      def hash60(s: String): Long = {
        val d0 = md.digest(s.getBytes("UTF-8"))
        var v = 0L
        var i = 0
        // 15 hex chars = 60 bits = 7.5 bytes: 7 full bytes + high nibble.
        while (i < 7) { v = (v << 8) | (d0(i) & 0xFFL); i += 1 }
        (v << 4) | ((d0(7) & 0xF0L) >> 4)
      }
    }

    /** (n_grams, embedding) of one blob. The blob is read as UTF-8
      * text (the fixture contract; a trained byte-level model would
      * hash byte n-grams the same way). Empty/short blobs embed as the
      * zero vector with n_grams = 0. */
    def embed(bytes: Array[Byte], h: Hasher): (Long, Array[Long]) = {
      val acc = new Array[Long](dim)
      if (bytes == null) return (0L, acc)
      val s = new String(bytes, "UTF-8")
      val n = s.length - 2
      if (n <= 0) return (0L, acc)
      var i = 0
      while (i < n) {
        val bucket = h.hash60(s.substring(i, i + 3))
        val w = h.hash60("w:" + bucket)
        var d2 = 0
        while (d2 < dim) {
          acc(d2) += ((w >>> (7 * d2)) & 127L) - 64L
          d2 += 1
        }
        i += 1
      }
      (n.toLong, acc)
    }
  }

  /** Batched embedding inference over a media table: adds
    * (`n_grams` long, `embedding` array<long>) per row — the
    * [[extractFeatures]] batch contract with [[EmbedKernel]] as the
    * model. */
  def inferEmbedding(df: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val outSchema = df.schema
      .add("n_grams", LongType).add("embedding", ArrayType(LongType))
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      val hasher = new EmbedKernel.Hasher // per-partition "model load"
      it.map { row =>
        val (n, e) = EmbedKernel.embed(row.getAs[Array[Byte]](idx), hasher)
        Row.fromSeq(row.toSeq :+ n :+ e.toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize stub: deterministic byte truncation standing in for a real
    * scaler; the meta struct is updated for real (the part downstream
    * pruning depends on). */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("bytes",
        expr(s"substring(bytes, 1, greatest(octet_length(bytes)/2, 1))"))
      .withColumn("meta", struct(
        lit(width).as("width"), lit(height).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.format").as("format")))

  /** Audio resample stub: models a sample-rate conversion on `audio`
    * rows — payload length rescales by targetRate/sample_rate (a real
    * resampler changes the sample count by exactly that ratio),
    * `meta.sample_rate` updates to the target, `duration_ms` is
    * preserved (resampling never changes duration). Non-audio rows pass
    * through untouched. The byte content is a deterministic prefix
    * slice standing in for the interpolation kernel (no audio codec in
    * this container); everything else — the meta arithmetic, the typed
    * struct rebuild, the per-row expressions — is the real Spark
    * plumbing, fully codegen'd, no UDF.
    *
    * DOWNSAMPLE-ONLY contract: the prefix-slice stand-in cannot extend
    * bytes, so `targetRate` must not exceed any row's source rate —
    * `_rlen` is clamped to the payload length as defense (meta and
    * bytes then stay consistent: a clamped row keeps its full payload),
    * and upsampling stays out of contract until a real interpolation
    * kernel replaces the slice. */
  def resampleAudio(df: DataFrame, targetRate: Int): DataFrame = {
    val isAudio = col("kind") === "audio"
    df
      // _rlen reads meta BEFORE the struct rebuild below.
      .withColumn("_rlen",
        least(
          floor(octet_length(col("bytes")).cast("double") * targetRate /
            col("meta.sample_rate")).cast("int"),
          octet_length(col("bytes"))))
      .withColumn("bytes",
        when(isAudio, expr("substring(bytes, 1, _rlen)")).otherwise(col("bytes")))
      .withColumn("meta",
        when(isAudio, struct(
          col("meta.width").as("width"), col("meta.height").as("height"),
          lit(targetRate).as("sample_rate"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.format").as("format"))).otherwise(col("meta")))
      .drop("_rlen")
  }

  /** REAL image codec — JDK `javax.imageio` (PNG ships in every JDK, so
    * no new dependency): encode on the fixture side, decode on the
    * query side. Retires the round-3/4 "no codecs in this container"
    * justification for stubbing image decode — the byte-histogram
    * [[MediaCodec]] remains only as the generic featurizer for
    * modalities whose codecs genuinely are absent (audio/video). */
  object ImageCodec {

    /** Deterministic tiny RGB PNG: solid fill (r,g,b) with the (0,0)
      * corner offset by +128 per channel — the corner forces a decoder
      * to read actual pixels (a metadata passthrough or a solid-color
      * shortcut gets the per-pixel sums wrong). Real ImageIO encode;
      * PNG is lossless so decode recovers every pixel exactly,
      * regardless of encoder byte-layout differences across JDKs. */
    def encodePng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val fill = (r << 16) | (g << 8) | b
      val corner = (((r + 128) % 256) << 16) | (((g + 128) % 256) << 8) | ((b + 128) % 256)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, if (x == 0 && y == 0) corner else fill); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream(256)
      // Memory-cached stream: ImageIO's default OutputStream path backs
      // the stream with a TEMP FILE per call — on a per-row codec that
      // is a create/delete syscall pair per record, the dominant cost.
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
      bos.toByteArray
    }

    /** REAL nearest-neighbor resize: decode, resample every output
      * pixel from src (x·w DIV outW, y·h DIV outH) — the explicit
      * floor mapping, so the sampling grid is engine-predictable and
      * the oracle derives resized pixel sums exactly — re-encode PNG.
      * This retires the byte-truncation resize stand-in for image
      * rows: the output is a genuine image whose decode proves the
      * kernel ran (a metadata-only "resize" fails the decoded dims,
      * a wrong sampling grid fails the sums). None for undecodable
      * input. */
    def resizeNearest(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
      if (bytes == null) return None
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new java.awt.image.BufferedImage(
        outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * h / outH).toInt
        var x = 0
        while (x < outW) {
          out.setRGB(x, y, img.getRGB((x.toLong * w / outW).toInt, sy))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream(256)
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(out, "png", ios) finally ios.close()
      Some(bos.toByteArray)
    }

    /** Decode + per-channel pixel sums. Null for undecodable bytes. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
      if (bytes == null) return None
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      if (img == null) return None
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          x += 1
        }
        y += 1
      }
      Some((img.getWidth, img.getHeight, sr, sg, sb))
    }
  }

  /** REAL audio codec — `javax.sound.sampled` (WAV/PCM ships in every
    * JDK, so no new dependency): encode on the fixture side, decode on
    * the query side. Retires the "no audio codec in this container"
    * justification the byte-histogram stand-in carried through round 9
    * — [[MediaCodec]] remains only for video. PCM is lossless, so the
    * decoded 16-bit samples recover the planted arithmetic exactly,
    * whatever header layout the writer chose. */
  object AudioCodec {

    /** The planted sample value: frame `i`, channel `c` of blob `id` —
      * pure integer arithmetic, mirrored by the DuckDB oracle. Every
      * frame differs, so a decoder that shortcuts per-sample reads (or
      * mis-strides interleaved channels) gets the sums wrong. */
    def sampleValue(id: Long, i: Int, c: Int): Short =
      (((id * 31 + i.toLong * 7 + c.toLong * 13) % 65536) - 32768).toShort

    /** Deterministic 16-bit little-endian PCM WAV via a REAL
      * `AudioSystem.write`: `n` frames of `channels` interleaved
      * planted samples at `rate` Hz. */
    def encodeWav(id: Long, n: Int, channels: Int, rate: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        rate.toFloat, 16, channels, true, false)
      val pcm = new Array[Byte](n * channels * 2)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < channels) {
          val v = sampleValue(id, i, c)
          val off = (i * channels + c) * 2
          pcm(off) = (v & 0xFF).toByte
          pcm(off + 1) = ((v >> 8) & 0xFF).toByte
          c += 1
        }
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream(44 + pcm.length)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode + per-channel signed-sample sums (≤ 2 channels reported).
      * Format facts (channels, rate, frame count) come from the DECODED
      * header, the sums from reading every frame. None for undecodable
      * bytes. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Option[Long])] = {
      if (bytes == null) return None
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        val ch = fmt.getChannels
        val data = ais.readAllBytes()
        val frames = data.length / (2 * ch)
        var (s0, s1) = (0L, 0L)
        var i = 0
        while (i < frames) {
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            val v = ((data(off) & 0xFF) | (data(off + 1) << 8)).toShort.toLong
            if (c == 0) s0 += v else if (c == 1) s1 += v
            c += 1
          }
          i += 1
        }
        Some((ch, fmt.getSampleRate.toInt, frames.toLong, s0,
          if (ch >= 2) Some(s1) else None))
      } catch { case _: Exception => None }
    }
  }

  /** Audio-table fixture: one REAL WAV per document, frame count /
    * channel count / sample rate planted as doc_id arithmetic (mirrored
    * by the DuckDB oracle), encoded executor-side in a batched
    * partition pass — the driver never sees a blob. */
  def wavsFromDocuments(docs: DataFrame): DataFrame = {
    val in = docs.select(col("doc_id").cast("long"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("wav", BinaryType),
      StructField("meta", metaType)))
    in.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val n = (id % 50 + 10).toInt
        val ch = (id % 2 + 1).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        Row(id, AudioCodec.encodeWav(id, n, ch, rate),
          Row(null, null, rate, n * 1000L / rate, "wav"))
      }
    }(Encoders.row(schema))
  }

  /** Batched real WAV decode: adds decoded channel count, sample rate,
    * frame count, and per-channel sample sums. Same batch shape as
    * [[decodeImages]]. */
  def decodeWavs(df: DataFrame, bytesCol: String = "wav"): DataFrame = {
    val outSchema = df.schema
      .add("channels_dec", IntegerType).add("rate_dec", IntegerType)
      .add("n_samples_dec", LongType)
      .add("sum_c0", LongType).add("sum_c1", LongType)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val extra: Seq[Any] = AudioCodec.decode(row.getAs[Array[Byte]](idx)) match {
          case Some((ch, rate, n, s0, s1)) =>
            Seq[Any](Int.box(ch), Int.box(rate), Long.box(n), Long.box(s0),
              s1.map(Long.box).orNull)
          case None => Seq(null, null, null, null, null)
        }
        Row.fromSeq(row.toSeq ++ extra)
      }
    }(Encoders.row(outSchema))
  }

  /** REAL video codec — multi-frame (animated) GIF via JDK ImageIO:
    * `prepareWriteSequence`/`writeToSequence` on the fixture side, the
    * frame-indexed `ImageReader.read(i)` on the query side. GIF is
    * palette-indexed and each frame here carries an EXPLICIT two-entry
    * `IndexColorModel` (fill + corner accent), so the round-trip is
    * pixel-exact — no quantizer ever runs. Frame SAMPLING (decode every
    * k-th frame without decoding the rest) is the operation a video
    * training pipeline actually runs; [[decode]] takes the stride
    * directly so the skip happens inside the reader loop. */
  object VideoCodec {

    /** Planted fill color of frame `f` of blob `id` — pure integer
      * arithmetic, mirrored by the DuckDB oracle. Every frame differs,
      * so a decoder that replays frame 0 (or composites disposal state
      * wrongly) gets the per-frame sums wrong. */
    def frameColor(id: Long, f: Int): (Int, Int, Int) =
      (((id * 7 + f * 11) % 256).toInt,
        ((id * 13 + f * 17) % 256).toInt,
        ((id * 19 + f * 23) % 256).toInt)

    private def frameImage(w: Int, h: Int, r: Int, g: Int, b: Int) = {
      // Two exact palette entries: fill, and the (0,0) corner offset by
      // +128 per channel (forces per-pixel reads, as in ImageCodec).
      val rs = Array(r.toByte, ((r + 128) % 256).toByte)
      val gs = Array(g.toByte, ((g + 128) % 256).toByte)
      val bs = Array(b.toByte, ((b + 128) % 256).toByte)
      val icm = new java.awt.image.IndexColorModel(8, 2, rs, gs, bs)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = img.getRaster
      raster.setSample(0, 0, 0, 1) // corner → palette index 1
      var y = 0
      while (y < h) {
        var x = if (y == 0) 1 else 0
        while (x < w) { raster.setSample(x, y, 0, 0); x += 1 }
        y += 1
      }
      img
    }

    /** Deterministic `n`-frame animated GIF, every frame full-size (no
      * delta/disposal optimization), written through the REAL ImageIO
      * GIF sequence writer. */
    def encodeGif(id: Long, n: Int, w: Int, h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(1024)
      // Memory-cached: the default createImageOutputStream backs every
      // call with a temp FILE (see ImageCodec.encode note).
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < n) {
          val (r, g, b) = frameColor(id, f)
          writer.writeToSequence(
            new javax.imageio.IIOImage(frameImage(w, h, r, g, b), null, null),
            null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Decode every `stride`-th frame: (width, height, total frame
      * count, per-sampled-frame (index, sum_r, sum_g, sum_b)). The
      * frame count comes from the DECODED stream directory, the sums
      * from reading the sampled frames' pixels; skipped frames are
      * never pixel-decoded. None for undecodable bytes. */
    def decode(bytes: Array[Byte], stride: Int = 1)
        : Option[(Int, Int, Int, Seq[(Int, Long, Long, Long)])] = {
      if (bytes == null) return None
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        val frames = Seq.newBuilder[(Int, Long, Long, Long)]
        var f = 0
        while (f < n) {
          val img = reader.read(f)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              x += 1
            }
            y += 1
          }
          frames += ((f, sr, sg, sb))
          f += stride
        }
        Some((reader.getWidth(0), reader.getHeight(0), n, frames.result()))
      } catch { case _: Exception => None } finally reader.dispose()
    }
  }

  /** Video-table fixture: one REAL animated GIF per document, frame
    * count / dimensions / per-frame colors planted as doc_id arithmetic
    * (mirrored by the DuckDB oracle), encoded executor-side in a
    * batched partition pass — the driver never sees a blob. */
  def gifsFromDocuments(docs: DataFrame): DataFrame = {
    val in = docs.select(col("doc_id").cast("long"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("gif", BinaryType),
      StructField("meta", metaType)))
    in.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val n = (id % 6 + 2).toInt
        val w = (id % 5 + 2).toInt
        val h = (id % 4 + 2).toInt
        Row(id, VideoCodec.encodeGif(id, n, w, h),
          Row(w, h, null, n * 40L, "gif"))
      }
    }(Encoders.row(schema))
  }

  /** Batched real GIF frame-sample decode: one OUTPUT ROW PER SAMPLED
    * FRAME (media_id, decoded width/height/frame-count, frame index,
    * per-channel pixel sums). Same batched-partition shape as
    * [[decodeImages]]; skipped frames are never pixel-decoded. */
  def decodeGifFrames(df: DataFrame, bytesCol: String = "gif",
                      stride: Int = 1): DataFrame = {
    val base = df.schema(df.schema.fieldIndex("media_id"))
    val outSchema = StructType(Seq(
      base,
      StructField("w_dec", IntegerType), StructField("h_dec", IntegerType),
      StructField("n_frames_dec", IntegerType),
      StructField("frame_idx", IntegerType),
      StructField("sum_r", LongType), StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val idIdx = df.schema.fieldIndex("media_id")
    df.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.get(idIdx)
        VideoCodec.decode(row.getAs[Array[Byte]](bytesIdx), stride) match {
          case Some((w, h, n, frames)) => frames.iterator.map {
            case (f, sr, sg, sb) =>
              Row(id, Int.box(w), Int.box(h), Int.box(n), Int.box(f),
                Long.box(sr), Long.box(sg), Long.box(sb))
          }
          case None =>
            Iterator.single(Row(id, null, null, null, null, null, null, null))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Image-table fixture: one REAL PNG per document, dimensions and
    * fill colors planted as pure doc_id arithmetic (mirrored by the
    * DuckDB oracle), encoded executor-side in a batched partition pass
    * — the driver never sees a blob. */
  def imagesFromDocuments(docs: DataFrame): DataFrame = {
    val in = docs.select(col("doc_id").cast("long"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("png", BinaryType),
      StructField("meta", metaType)))
    in.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val w = (id % 5 + 1).toInt
        val h = (id % 3 + 1).toInt
        val r = ((id * 37) % 256).toInt
        val g = ((id * 59) % 256).toInt
        val b = ((id * 83) % 256).toInt
        Row(id, ImageCodec.encodePng(w, h, r, g, b), Row(w, h, null, null, "png"))
      }
    }(Encoders.row(schema))
  }

  /** Batched REAL resize over an image table: adds `png2` (the
    * nearest-neighbor-resampled, re-encoded PNG) per row — the
    * [[extractFeatures]] batch contract with [[ImageCodec.resizeNearest]]
    * as the kernel. Undecodable rows carry null. */
  def resizeImages(df: DataFrame, outW: Int, outH: Int,
                   bytesCol: String = "png"): DataFrame = {
    val outSchema = df.schema.add("png2", BinaryType)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        val resized = ImageCodec
          .resizeNearest(row.getAs[Array[Byte]](idx), outW, outH).orNull
        Row.fromSeq(row.toSeq :+ resized)
      }
    }(Encoders.row(outSchema))
  }

  /** Batched real decode: adds decoded dimensions and per-channel pixel
    * sums (exact longs — PNG is lossless) to each row. Same batch shape
    * as [[extractFeatures]]; per-partition reader initialization is
    * where a heavier codec would amortize. */
  def decodeImages(df: DataFrame, bytesCol: String = "png"): DataFrame = {
    val outSchema = df.schema
      .add("width_dec", IntegerType).add("height_dec", IntegerType)
      .add("sum_r", LongType).add("sum_g", LongType).add("sum_b", LongType)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { row =>
        // Boxed explicitly: a bare Seq(w, h, sr, …) would widen the Ints
        // to Long by weak conformance and break the row encoder.
        val extra: Seq[Any] = ImageCodec.decode(row.getAs[Array[Byte]](idx)) match {
          case Some((w, h, sr, sg, sb)) =>
            Seq[Any](Int.box(w), Int.box(h), Long.box(sr), Long.box(sg), Long.box(sb))
          case None => Seq(null, null, null, null, null)
        }
        Row.fromSeq(row.toSeq ++ extra)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling stub: explode a video blob into `n` frame blobs
    * (deterministic byte slices) with a frame index — the shape a real
    * frame sampler produces (one row per frame, meta carried along). */
  def frameSample(df: DataFrame, n: Int): DataFrame = {
    // ONE slice-length definition (integer DIV, floor ≥ 1) bound for
    // both the offset and the length — the earlier dead double-division
    // val invited auditing the wrong formula.
    val sliceLen = s"greatest(octet_length(bytes) DIV $n, 1)"
    df.select(col("media_id"), col("kind"), col("meta"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"),
        col("bytes"))
      .withColumn("frame_bytes",
        expr(s"substring(bytes, frame_idx * $sliceLen + 1, $sliceLen)"))
      .drop("bytes")
      .filter(octet_length(col("frame_bytes")) > 0)
  }
}
