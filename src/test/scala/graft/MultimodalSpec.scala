package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaCodec

/** Multimodal plumbing tests: binary+meta schema round-trips parquet,
  * the batched decode stub is deterministic and batch-shaped, frame
  * sampling explodes with correct slices. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def docs() = {
    val s = spark
    import s.implicits._
    Seq((0L, "hello world"), (1L, "abc"), (2L, "media bytes here"), (3L, "x"))
      .toDF("doc_id", "text")
  }

  test("fromDocuments builds binary + typed meta struct") {
    val m = Multimodal.fromDocuments(docs())
    val r = m.orderBy("media_id").collect()
    assert(r.map(_.getString(1)).toSeq == Seq("image", "audio", "video", "image"))
    assert(new String(r(0).getAs[Array[Byte]]("bytes"), "UTF-8") == "hello world")
    val meta = r(1).getStruct(3)
    assert(meta.getAs[Int]("width") == 512 && meta.getAs[String]("format") == "wav")
  }

  test("media table round-trips parquet with blob and struct intact") {
    val dir = Files.createTempDirectory("graft-media").resolve("media").toString
    Multimodal.fromDocuments(docs()).write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("bytes").dataType.typeName == "binary")
    assert(back.schema("meta").dataType == Multimodal.metaType)
    val r = back.filter(col("media_id") === 2).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("bytes"), "UTF-8") == "media bytes here")
  }

  test("metadata predicates prune without touching blobs (pushed filters)") {
    val dir = Files.createTempDirectory("graft-media").resolve("media").toString
    Multimodal.fromDocuments(docs()).write.parquet(dir)
    val plan = spark.read.parquet(dir)
      .filter(col("meta.width") > 300).select("media_id", "meta.width")
      .queryExecution.executedPlan.toString
    // The scan must read only the projected/filtered columns, not bytes.
    assert(plan.contains("PushedFilters") && !plan.contains("bytes"))
  }

  test("decode stub: deterministic unit-sum histogram with the batch signature") {
    val f1 = MediaCodec.features("hello".getBytes("UTF-8"))
    val f2 = MediaCodec.features("hello".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
    assert(MediaCodec.features(Array.emptyByteArray).toSeq.sum == 0f)

    val out = Multimodal.extractFeatures(Multimodal.fromDocuments(docs()))
    val r = out.orderBy("media_id").collect()
    assert(r.forall(_.getAs[scala.collection.Seq[Float]]("features").length == 16))
    val hello = r(0).getAs[scala.collection.Seq[Float]]("features")
    assert(hello.toSeq == MediaCodec.features("hello world".getBytes("UTF-8")).toSeq)
  }

  test("frameSample explodes each video into n in-order slices") {
    val frames = Multimodal.frameSample(
      Multimodal.fromDocuments(docs()).filter(col("media_id") === 2), 4)
    val r = frames.orderBy("frame_idx").collect()
    assert(r.length == 4)
    val joined = r.map(x => new String(x.getAs[Array[Byte]]("frame_bytes"), "UTF-8")).mkString
    // 16 bytes / 4 frames = 4-byte slices covering the prefix.
    assert(joined == "media bytes here")
  }

  test("resampleAudio rescales audio payloads, retargets rate, preserves duration") {
    val m = Multimodal.fromDocuments(docs())
    val before = m.orderBy("media_id").collect()
    val r = Multimodal.resampleAudio(m, 16000).orderBy("media_id").collect()
    // doc 1 is the audio row ("abc", sample_rate = (1%2)*22050+22050 = 44100).
    val audio = r(1)
    val audioMeta = audio.getStruct(3)
    assert(audioMeta.getAs[Int]("sample_rate") == 16000)
    assert(audioMeta.getAs[Long]("duration_ms") ==
      before(1).getStruct(3).getAs[Long]("duration_ms"))
    // len 3 * 16000/44100 = 1.088 → floor 1 byte.
    assert(audio.getAs[Array[Byte]]("bytes").length == 1)
    // Non-audio rows are untouched, bytes and meta.
    for (i <- Seq(0, 2, 3)) {
      assert(r(i).getAs[Array[Byte]]("bytes").toSeq ==
        before(i).getAs[Array[Byte]]("bytes").toSeq)
      assert(r(i).getStruct(3) == before(i).getStruct(3))
    }
  }

  test("resampleAudio clamps out-of-contract upsampling to the payload length") {
    // The prefix-slice stand-in cannot extend bytes; a target rate above
    // the source rate must keep the full payload (clamped _rlen), never
    // a silently short one with a meta that claims more samples.
    val m = Multimodal.fromDocuments(docs())
    val before = m.orderBy("media_id").collect()
    val up = Multimodal.resampleAudio(m, 96000).orderBy("media_id").collect()
    val audio = up(1) // doc 1: audio, sample_rate 44100 < 96000
    assert(audio.getAs[Array[Byte]]("bytes").toSeq ==
      before(1).getAs[Array[Byte]]("bytes").toSeq)
    assert(audio.getStruct(3).getAs[Int]("sample_rate") == 96000)
  }

  test("resizeStub updates meta for real while stubbing the byte transform") {
    val out = Multimodal.resizeStub(Multimodal.fromDocuments(docs()), 64, 64)
    val r = out.filter(col("media_id") === 0).collect()(0)
    assert(r.getStruct(r.fieldIndex("meta")).getAs[Int]("width") == 64)
    assert(r.getAs[Array[Byte]]("bytes").length == 5) // 11/2 = 5
  }

  test("ImageCodec: real PNG encode → decode recovers every planted pixel") {
    import Multimodal.ImageCodec
    // Corner-offset fill: decode must read actual pixels, not metadata.
    val bytes = ImageCodec.encodePng(4, 3, 10, 200, 255)
    // A real PNG container, not our arithmetic: magic bytes.
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val Some((w, h, sr, sg, sb)) = ImageCodec.decode(bytes)
    assert(w == 4 && h == 3)
    assert(sr == 11L * 10 + (10 + 128) % 256)
    assert(sg == 11L * 200 + (200 + 128) % 256)
    assert(sb == 11L * 255 + (255 + 128) % 256)
    // 1×1: the lone pixel IS the corner.
    assert(ImageCodec.decode(ImageCodec.encodePng(1, 1, 7, 8, 9))
      .contains((1, 1, 135L, 136L, 137L)))
    // Undecodable bytes are None, not a task failure.
    assert(ImageCodec.decode("not a png".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
  }

  test("AudioCodec: real WAV encode → decode recovers every planted sample") {
    import graft.multimodal.Multimodal.AudioCodec
    val bytes = AudioCodec.encodeWav(id = 5L, n = 12, channels = 2, rate = 16000)
    // A real RIFF/WAVE container, not a pass-through of the PCM buffer.
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val Some((ch, rate, n, s0, s1)) = AudioCodec.decode(bytes)
    assert(ch == 2 && rate == 16000 && n == 12L)
    def want(c: Int) = (0 until 12).map(i => AudioCodec.sampleValue(5L, i, c).toLong).sum
    assert(s0 == want(0))
    assert(s1.contains(want(1)), "channel interleave must not cross-bleed")
    // Mono: one channel reported, the second absent.
    val Some((ch1, _, n1, m0, m1)) = AudioCodec.decode(
      AudioCodec.encodeWav(id = 6L, n = 10, channels = 1, rate = 8000))
    assert(ch1 == 1 && n1 == 10L && m1.isEmpty)
    assert(m0 == (0 until 10).map(i => AudioCodec.sampleValue(6L, i, 0).toLong).sum)
    // Undecodable bytes are None, not a task failure.
    assert(AudioCodec.decode("not a wav".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decode(null).isEmpty)
  }

  test("VideoCodec: real animated-GIF encode → frame-exact decode") {
    import graft.multimodal.Multimodal.VideoCodec
    val bytes = VideoCodec.encodeGif(id = 7L, n = 5, w = 4, h = 3)
    // A real GIF container, not a pass-through buffer.
    assert(new String(bytes.take(6), "US-ASCII").startsWith("GIF8"))
    val Some((w, h, n, all)) = VideoCodec.decode(bytes)
    assert(w == 4 && h == 3 && n == 5 && all.length == 5)
    all.foreach { case (f, sr, sg, sb) =>
      val (r, g, b) = VideoCodec.frameColor(7L, f)
      assert(sr == (4 * 3 - 1).toLong * r + (r + 128) % 256, s"frame $f red")
      assert(sg == (4 * 3 - 1).toLong * g + (g + 128) % 256, s"frame $f green")
      assert(sb == (4 * 3 - 1).toLong * b + (b + 128) % 256, s"frame $f blue")
    }
    // Stride sampling decodes only every k-th frame.
    val Some((_, _, n2, sampled)) = VideoCodec.decode(bytes, stride = 2)
    assert(n2 == 5 && sampled.map(_._1) == Seq(0, 2, 4))
    // Undecodable bytes are None, not a task failure.
    assert(VideoCodec.decode("not a gif".getBytes("UTF-8")).isEmpty)
    assert(VideoCodec.decode(null).isEmpty)
  }

  test("decodeGifFrames: distributed frame-sample matches planted arithmetic") {
    val gifs = Multimodal.gifsFromDocuments(docs())
      .select(col("media_id"), col("gif")) // no meta available to cheat from
      .repartition(3)
    val out = Multimodal.decodeGifFrames(gifs, stride = 2)
      .orderBy("media_id", "frame_idx").collect()
    val expected = Seq(0L, 1L, 2L, 3L).flatMap { id =>
      val n = (id % 6 + 2).toInt
      (0 until n by 2).map(f => (id, f))
    }
    assert(out.map(r => (r.getLong(0), r.getInt(r.fieldIndex("frame_idx")))).toSeq
      == expected)
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 5 + 2).toInt, (id % 4 + 2).toInt)
      val f = r.getInt(r.fieldIndex("frame_idx"))
      val (cr, cg, cb) = Multimodal.VideoCodec.frameColor(id, f)
      assert(r.getInt(r.fieldIndex("w_dec")) == w)
      assert(r.getInt(r.fieldIndex("h_dec")) == h)
      assert(r.getInt(r.fieldIndex("n_frames_dec")) == (id % 6 + 2).toInt)
      assert(r.getLong(r.fieldIndex("sum_r")) == (w * h - 1).toLong * cr + (cr + 128) % 256)
      assert(r.getLong(r.fieldIndex("sum_g")) == (w * h - 1).toLong * cg + (cg + 128) % 256)
      assert(r.getLong(r.fieldIndex("sum_b")) == (w * h - 1).toLong * cb + (cb + 128) % 256)
    }
  }

  test("decodeWavs: distributed round-trip matches planted doc_id arithmetic") {
    val wavs = Multimodal.wavsFromDocuments(docs())
      .select(col("media_id"), col("wav")) // no meta available to cheat from
      .repartition(3)
    val out = Multimodal.decodeWavs(wavs).orderBy("media_id").collect()
    assert(out.length == 4)
    out.foreach { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      val (n, ch) = ((id % 50 + 10).toInt, (id % 2 + 1).toInt)
      def want(c: Int) = (0 until n)
        .map(i => Multimodal.AudioCodec.sampleValue(id, i, c).toLong).sum
      assert(r.getInt(r.fieldIndex("channels_dec")) == ch)
      assert(r.getInt(r.fieldIndex("rate_dec")) == 8000 + (id % 3).toInt * 4000)
      assert(r.getLong(r.fieldIndex("n_samples_dec")) == n.toLong)
      assert(r.getLong(r.fieldIndex("sum_c0")) == want(0))
      if (ch == 2) assert(r.getLong(r.fieldIndex("sum_c1")) == want(1))
      else assert(r.isNullAt(r.fieldIndex("sum_c1")))
    }
  }

  test("decodeImages: distributed round-trip matches planted doc_id arithmetic") {
    val imgs = Multimodal.imagesFromDocuments(docs())
      .select(col("media_id"), col("png")) // no meta available to cheat from
      .repartition(3)
    val out = Multimodal.decodeImages(imgs).orderBy("media_id").collect()
    assert(out.length == 4)
    out.foreach { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      val (w, h) = ((id % 5 + 1).toInt, (id % 3 + 1).toInt)
      val rr = (id * 37) % 256
      assert(r.getInt(r.fieldIndex("width_dec")) == w)
      assert(r.getInt(r.fieldIndex("height_dec")) == h)
      assert(r.getLong(r.fieldIndex("sum_r")) == (w * h - 1) * rr + (rr + 128) % 256)
    }
  }
}
