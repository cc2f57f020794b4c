package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column queries over the deterministic media table derived
  * from `documents` ([[Multimodal.fromDocuments]]).
  *
  * `q_multimodal_meta` is fully oracle-checked (binary sizes + struct
  * metadata are engine-independent arithmetic). `q_multimodal_features`
  * exercises the batched binary → feature path (mapPartitions decode
  * stub) and IS oracle-checked despite the float features: each
  * normalized bin is c/len at float precision (relative error 2⁻²⁴), so
  * `round(bin * len)` recovers the exact integer byte count (error ≤
  * len·2⁻²⁴ ≪ 0.5), and the emitted columns are all exact BIGINTs.
  * DuckDB rebuilds the same counts from `ord()` over the text, byte =
  * codepoint because the corpus is pure ASCII.
  */
object MultimodalQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> ((s, d) =>
      Multimodal.fromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("kind"),
          octet_length(col("bytes")).cast("long").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.format").as("format"))
        .orderBy("media_id")),

    // Audio resample chain: blob rescaled by targetRate/sample_rate,
    // meta updated, duration preserved. n_bytes_out is measured from
    // the ACTUAL resampled blob (octet_length after the substring), so
    // the oracle checks the operator, not just its arithmetic.
    "q_multimodal_audio" -> ((s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
        .withColumn("n_bytes_in", octet_length(col("bytes")).cast("long"))
      Multimodal.resampleAudio(media, 16000)
        .filter(col("kind") === "audio")
        .select(col("media_id"), col("n_bytes_in"),
          octet_length(col("bytes")).cast("long").as("n_bytes_out"),
          col("meta.sample_rate").cast("long").as("sample_rate_out"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("media_id")
    }),

    // Frame sampling: each video blob explodes into 4 deterministic
    // frame slices (one row per frame, meta carried) — the shape a real
    // frame sampler produces. The frames are byte slices of the blob,
    // so the oracle rebuilds them with substr over the source text
    // (ASCII corpus: byte ≡ character) — checking the actual slice
    // CONTENT, not just its length.
    "q_multimodal_frames" -> ((s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "video")
      Multimodal.frameSample(media, 4)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          octet_length(col("frame_bytes")).cast("long").as("n_frame_bytes"),
          col("frame_bytes").cast("string").as("frame_text"))
        .orderBy("media_id", "frame_idx")
    }),

    // REAL image decode (JDK ImageIO): the fixture encodes one genuine
    // tiny PNG per document (dimensions + fill colors planted as doc_id
    // arithmetic), the query decodes the PNG BYTES ALONE — meta is
    // dropped before the decode pass, so the decoded dimensions and
    // per-channel pixel sums can only come from actually parsing the
    // image — and the oracle recomputes the planted values in DuckDB.
    // The (0,0) corner pixel is offset +128 per channel: a decoder that
    // shortcuts per-pixel reads gets the sums wrong.
    "q_image_decode" -> ((s, d) => {
      val imgs = Multimodal.imagesFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("png")) // provably no meta passthrough
      Multimodal.decodeImages(imgs)
        .select(col("media_id"),
          col("width_dec").cast("long").as("width_dec"),
          col("height_dec").cast("long").as("height_dec"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("media_id")
    }),

    // REAL audio decode (javax.sound.sampled): the fixture encodes one
    // genuine 16-bit PCM WAV per document (frame count, channel count,
    // rate, and every interleaved sample planted as doc_id arithmetic),
    // the query decodes the WAV BYTES ALONE — meta is dropped before
    // the decode pass, so channel/rate/frame facts come from the parsed
    // header and the per-channel sums from reading every frame. Every
    // sample differs (i·7 + c·13 stride), so a decoder that skips
    // frames or mis-strides the channel interleave gets the sums wrong.
    "q_audio_decode" -> ((s, d) => {
      val wavs = Multimodal.wavsFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("wav")) // provably no meta passthrough
      Multimodal.decodeWavs(wavs)
        .select(col("media_id"),
          col("channels_dec").cast("long").as("channels_dec"),
          col("rate_dec").cast("long").as("rate_dec"),
          col("n_samples_dec"), col("sum_c0"), col("sum_c1"))
        .orderBy("media_id")
    }),

    // REAL video frame-sample decode (multi-frame GIF via ImageIO):
    // the fixture encodes one genuine animated GIF per document (frame
    // count, dimensions, and every frame's two-color palette planted
    // as doc_id arithmetic), the query decodes the GIF BYTES ALONE
    // with stride 2 — the every-k-th-frame sampling a video training
    // pipeline runs; skipped frames are never pixel-decoded. Every
    // frame's fill differs (f*11/17/23 strides), so a decoder that
    // replays frame 0 or mis-composites disposal state diverges.
    "q_video_decode" -> ((s, d) => {
      val gifs = Multimodal.gifsFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("gif")) // provably no meta passthrough
      Multimodal.decodeGifFrames(gifs, stride = 2)
        .select(col("media_id"),
          col("w_dec").cast("long").as("w_dec"),
          col("h_dec").cast("long").as("h_dec"),
          col("n_frames_dec").cast("long").as("n_frames_dec"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("media_id", "frame_idx")
    }),

    // REAL image RESIZE end-to-end: planted PNGs resize to 7×5 through
    // the explicit nearest-neighbor kernel (floor sampling grid:
    // src = x·w DIV 7, y·h DIV 5), re-encode, then DECODE THE RESIZED
    // BYTES for the answer — so a metadata-only "resize" fails the
    // decoded dims and a wrong sampling grid fails the channel sums.
    // The oracle derives the resized sums in closed form: the (0,0)
    // corner pixel is replicated into a ceil(7/w) × ceil(5/h) block,
    // every other output pixel is the fill. Retires the byte-slice
    // resize stand-in for image rows.
    "q_image_resize" -> ((s, d) => {
      val imgs = Multimodal.imagesFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("png"))
      val resized = Multimodal.resizeImages(imgs, outW = 7, outH = 5)
        .select(col("media_id"), col("png2"))
      Multimodal.decodeImages(resized, "png2")
        .select(col("media_id"),
          col("width_dec").cast("long").as("width_dec"),
          col("height_dec").cast("long").as("height_dec"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("media_id")
    }),

    // Learned-embedding INFERENCE over the media table — the hashed
    // 3-gram linear projection ([[Multimodal.EmbedKernel]]): integer
    // weights derived from the mirrored hash60, so DuckDB recomputes
    // the whole forward pass — tokenize, hash, weight lookup,
    // accumulate — and the 8 embedding dims compare exactly. The
    // round-10 byte-histogram stand-in is retired; this is the real
    // inference batch shape (per-partition model init, per-row
    // forward) with a verifiable model.
    "q_embed_infer" -> ((s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("bytes"))
      val embedded = Multimodal.inferEmbedding(media)
      val dims = (0 until Multimodal.EmbedKernel.dim).map(i =>
        element_at(col("embedding"), i + 1).as(s"e${i + 1}"))
      embedded.select(Seq(col("media_id"), col("n_grams")) ++ dims: _*)
        .orderBy("media_id")
    }),

    "q_multimodal_features" -> ((s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
      // Exact count of bytes in histogram bin i, recovered from the
      // float-normalized feature: round(bin_i * n_bytes).
      def cnt(i: Int) =
        round(element_at(col("features"), i + 1).cast("double") * col("n_bytes"), 0)
          .cast("long")
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("kind"),
          octet_length(col("bytes")).cast("long").as("n_bytes"),
          col("features"))
        .select(col("media_id"), col("kind"), col("n_bytes"),
          cnt(2).as("bin2_count"), // bytes 0x20–0x2F: space + punctuation
          // Position-weighted checksum over ALL 16 bins — pins the whole
          // histogram, not just one bin.
          (0 until Multimodal.MediaCodec.bins)
            .map(i => cnt(i) * lit((i + 1).toLong)).reduce(_ + _).as("checksum"))
        .orderBy("media_id")
    })
  )

  def oracle: Map[String, String] = Map(
    // Planted-value mirror of the real PNG round-trip: w∈1..5, h∈1..3,
    // fill channel c = (doc_id * k) % 256 for k ∈ {37, 59, 83}, corner
    // pixel offset +128 (mod 256) per channel, so
    // sum_c = (w*h − 1) * c + (c + 128) % 256.
    "q_image_decode" ->
      """WITH p AS (SELECT doc_id,
        |   (doc_id % 5 + 1)::BIGINT AS w, (doc_id % 3 + 1)::BIGINT AS h,
        |   (doc_id * 37) % 256 AS r, (doc_id * 59) % 256 AS g,
        |   (doc_id * 83) % 256 AS b
        |  FROM documents)
        |SELECT doc_id AS media_id, w AS width_dec, h AS height_dec,
        |  ((w * h - 1) * r + (r + 128) % 256)::BIGINT AS sum_r,
        |  ((w * h - 1) * g + (g + 128) % 256)::BIGINT AS sum_g,
        |  ((w * h - 1) * b + (b + 128) % 256)::BIGINT AS sum_b
        | FROM p ORDER BY media_id""".stripMargin.replace("\n", ""),

    // Planted-value mirror of the real WAV round-trip: n = id%50+10
    // frames, ch = id%2+1 channels, rate = 8000 + (id%3)*4000; sample
    // (i, c) = ((id*31 + i*7 + c*13) % 65536) - 32768. PCM is lossless,
    // so the decoded per-channel sums equal the closed recomputation.
    "q_audio_decode" -> {
      def sumC(c: Int) =
        s"list_sum(list_transform(range(0, (doc_id % 50 + 10)::INT), " +
          s"i -> ((doc_id * 31 + i * 7 + $c * 13) % 65536) - 32768))::BIGINT"
      s"""SELECT doc_id AS media_id,
         | (doc_id % 2 + 1)::BIGINT AS channels_dec,
         | (8000 + (doc_id % 3) * 4000)::BIGINT AS rate_dec,
         | (doc_id % 50 + 10)::BIGINT AS n_samples_dec,
         | ${sumC(0)} AS sum_c0,
         | CASE WHEN doc_id % 2 = 1 THEN ${sumC(1)} END AS sum_c1
         | FROM documents ORDER BY media_id""".stripMargin.replace("\n", "")
    },

    // Planted-value mirror of the real GIF frame-sample round-trip:
    // n = id%6+2 frames of w×h = (id%5+2)×(id%4+2); sampled frames are
    // range(0, n, 2); frame f fills with (id*7+f*11, id*13+f*17,
    // id*19+f*23) % 256 except the (0,0) corner at +128 per channel,
    // so sum_c = (w·h−1)·c + (c+128)%256. GIF palettes are exact (the
    // encoder writes a 2-entry IndexColorModel), so the decoded sums
    // equal the closed recomputation.
    "q_video_decode" -> {
      def sumC(mul: Long, fmul: Long) = {
        val c = s"((media_id * $mul + frame_idx * $fmul) % 256)"
        s"((w * h - 1) * $c + ($c + 128) % 256)::BIGINT"
      }
      """WITH p AS (SELECT doc_id AS media_id, (doc_id % 6 + 2)::INT AS n,
        |   (doc_id % 5 + 2)::INT AS w, (doc_id % 4 + 2)::INT AS h
        |  FROM documents),
        | f AS (SELECT media_id, n, w, h,
        |   unnest(range(0, n, 2))::INT AS frame_idx FROM p)
        | SELECT media_id, w::BIGINT AS w_dec, h::BIGINT AS h_dec,
        |  n::BIGINT AS n_frames_dec, frame_idx::BIGINT AS frame_idx,
        |""".stripMargin.replace("\n", "") +
        s" ${sumC(7, 11)} AS sum_r, ${sumC(13, 17)} AS sum_g," +
        s" ${sumC(19, 23)} AS sum_b" +
        " FROM f ORDER BY media_id, frame_idx"
    },

    "q_multimodal_frames" ->
      """WITH v AS (SELECT doc_id AS media_id, text, strlen(text)::BIGINT AS len
        |   FROM documents WHERE doc_id % 3 = 2),
        | f AS (SELECT media_id, unnest(generate_series(0, 3)) AS frame_idx,
        |   text, len FROM v),
        | sl AS (SELECT media_id, frame_idx,
        |    substr(text, (frame_idx * greatest(len // 4, 1) + 1)::INT,
        |      greatest(len // 4, 1)::INT) AS frame_text
        |   FROM f)
        |SELECT media_id, frame_idx, strlen(frame_text)::BIGINT AS n_frame_bytes,
        |  frame_text
        | FROM sl WHERE strlen(frame_text) > 0
        | ORDER BY media_id, frame_idx""".stripMargin.replace("\n", ""),

    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        | ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
        | strlen(text)::BIGINT AS n_bytes,
        | ((doc_id % 4) * 256 + 256)::INT AS width,
        | ((doc_id % 3) * 256 + 256)::INT AS height,
        | ((doc_id % 2) * 22050 + 22050)::INT AS sample_rate,
        | ((doc_id % 7) * 1000 + 1000)::BIGINT AS duration_ms,
        | ['png','wav','mp4'][(doc_id % 3)::INT + 1] AS format
        | FROM documents ORDER BY media_id""".stripMargin.replace("\n", ""),

    // kind = audio ⟺ doc_id % 3 = 1 (fromDocuments arithmetic); the
    // resampled length mirrors floor(len * 16000 / rate) in double.
    "q_multimodal_audio" ->
      """SELECT doc_id AS media_id,
        | strlen(text)::BIGINT AS n_bytes_in,
        | floor(strlen(text)::DOUBLE * 16000 / ((doc_id % 2) * 22050 + 22050))::BIGINT AS n_bytes_out,
        | 16000::BIGINT AS sample_rate_out,
        | ((doc_id % 7) * 1000 + 1000)::BIGINT AS duration_ms
        | FROM documents WHERE doc_id % 3 = 1 ORDER BY media_id"""
        .stripMargin.replace("\n", ""),

    "q_image_resize" ->
      """WITH p AS (SELECT doc_id,
        |   (doc_id % 5 + 1)::BIGINT AS w, (doc_id % 3 + 1)::BIGINT AS h,
        |   (doc_id * 37) % 256 AS r, (doc_id * 59) % 256 AS g,
        |   (doc_id * 83) % 256 AS b
        |  FROM documents),
        | c AS (SELECT *, (7 + w - 1) // w AS cx, (5 + h - 1) // h AS cy
        |  FROM p)
        |SELECT doc_id AS media_id, 7::BIGINT AS width_dec,
        | 5::BIGINT AS height_dec,
        | ((35 - cx*cy) * r + cx*cy * ((r + 128) % 256))::BIGINT AS sum_r,
        | ((35 - cx*cy) * g + cx*cy * ((g + 128) % 256))::BIGINT AS sum_g,
        | ((35 - cx*cy) * b + cx*cy * ((b + 128) % 256))::BIGINT AS sum_b
        | FROM c ORDER BY media_id""".stripMargin.replace("\n", ""),

    "q_embed_infer" -> {
      val wExpr = graft.queries.OracleSql.hash60(
        s"'w:' || (${graft.queries.OracleSql.hash60("gram")})::VARCHAR")
      val dims = (0 until graft.multimodal.Multimodal.EmbedKernel.dim)
      val sums = dims.map(i =>
        s"sum(((w >> ${7 * i}) & 127) - 64)::BIGINT AS e${i + 1}").mkString(", ")
      val outs = dims.map(i =>
        s"coalesce(e${i + 1}, 0)::BIGINT AS e${i + 1}").mkString(", ")
      s"""WITH gr AS (SELECT doc_id, substr(text, i, 3) AS gram
         |   FROM (SELECT doc_id, text,
         |      unnest(range(1, greatest(strlen(text) - 1, 1))) AS i
         |     FROM documents)),
         | hw AS (SELECT doc_id, $wExpr AS w FROM gr),
         | e AS (SELECT doc_id, count(*)::BIGINT AS n_grams, $sums
         |   FROM hw GROUP BY doc_id)
         |SELECT d.doc_id AS media_id, coalesce(n_grams, 0)::BIGINT AS n_grams,
         | $outs
         | FROM documents d LEFT JOIN e ON e.doc_id = d.doc_id
         | ORDER BY media_id""".stripMargin.replace("\n", "")
    },

    "q_multimodal_features" ->
      """WITH b AS (SELECT doc_id, text,
        |   list_transform(range(1, strlen(text)+1), i -> ord(text[i])) AS bytes
        |  FROM documents)
        | SELECT doc_id AS media_id,
        |  ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
        |  strlen(text)::BIGINT AS n_bytes,
        |  coalesce(len(list_filter(bytes, x -> x // 16 = 2)), 0)::BIGINT AS bin2_count,
        |  coalesce(list_sum(list_transform(bytes, x -> (x // 16) + 1)), 0)::BIGINT AS checksum
        | FROM b ORDER BY media_id""".stripMargin.replace("\n", "")
  )
}
