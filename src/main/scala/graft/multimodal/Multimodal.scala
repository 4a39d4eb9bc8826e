package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2 #38): image/audio/video treated
  * as opaque `binary` payloads plus typed metadata, with decode /
  * feature-extraction as partition-wise batch processing.
  *
  * Image decode is REAL — JDK-only [[ImageCodec]] (javax.imageio:
  * PNG/JPEG/GIF/BMP) behind [[decodeImages]]/[[resizeImages]].
  * Audio decode is REAL too (r15) — JDK-only [[AudioCodec]]
  * (javax.sound.sampled: WAV/AIFF/AU, PCM/ULAW/ALAW) behind
  * [[decodeAudio]]/[[resampleAudio]], which executes [[resamplePlan]]
  * for real. VIDEO decode is REAL for the one JDK-reachable
  * container/codec pair (r16) — MJPEG-in-AVI via [[VideoCodec]]
  * (RIFF chunk walk + imageio JPEG per frame) behind
  * [[decodeVideoFrames]]; every OTHER video codec (H.264/VP9/AV1…)
  * has no JDK decoder and stays the declared STUB, replaced by a
  * deterministic fake (payload-slice hashes). Everything
  * around both is the real Spark plumbing a 100 TB media pipeline
  * needs: a typed payload schema, a
  * mapPartitions iterator that processes one asset at a time (never
  * materializes a partition — payloads can be tens of MB each), and
  * repartitioning by size class so decode-heavy partitions don't
  * skew executors.
  */
object Multimodal {

  /** Typed payload row: the schema contract for media tables. */
  final case class MediaAsset(
      asset_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      byte_mean: Double,
      byte_var: Double,
      head_hash: Long)

  /** Wrap a text corpus as a media-asset table (test double for a
    * real binary source: payload = utf8 bytes, metadata derived
    * deterministically from the id).
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      ((col("doc_id") % 16 + 1) * 64).cast("int").as("width"),
      ((col("doc_id") % 9 + 1) * 64).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"),
      when(col("doc_id") % 3 === 2, (col("doc_id") % 100 + 1) * 30)
        .otherwise(0).cast("int").as("n_frames"))

  /** Partition-wise decode: one asset at a time through the (stub)
    * decoder. The iterator-in/iterator-out shape is the contract —
    * a real codec slots into `decodeOne` without touching the plan.
    */
  def decodeFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(decodeOne))
  }

  /** STUB decoder: deterministic byte statistics standing in for
    * image-resize / audio-resample / frame-sample. Pure function of
    * the payload bytes — stable across runs and partitionings.
    */
  private def decodeOne(a: MediaAsset): MediaFeatures = {
    val bytes = a.payload
    var sum = 0.0; var sumSq = 0.0
    var i = 0
    while (i < bytes.length) {
      val v = (bytes(i) & 0xff).toDouble
      sum += v; sumSq += v * v
      i += 1
    }
    val n = math.max(bytes.length, 1)
    val mean = sum / n
    var h = 0xcbf29ce484222325L
    val headLen = math.min(bytes.length, 16)
    i = 0
    while (i < headLen) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    MediaFeatures(a.asset_id, a.media_type, bytes.length.toLong,
      mean, sumSq / n - mean * mean, h)
  }

  final case class DecodedImage(
      asset_id: Long, decoded: Boolean, format: String,
      width: Int, height: Int, channels: Int, mean_luma: Double)

  /** REAL image decode — JDK-only [[ImageCodec]] (PNG/JPEG/GIF/BMP,
    * the readers every JRE ships), same iterator-per-asset contract
    * as [[decodeFeatures]]: payloads stream through one at a time
    * and never accumulate in the partition. Emits TRUE pixel
    * dimensions/channels from the decoded raster (the metadata
    * columns are what the upstream CLAIMS; a crawled corpus lies).
    * Payloads ImageIO cannot parse — corrupt bytes, or the text
    * test double — come back `decoded = false` with the claimed
    * metadata dims passed through, because at 100 TB decode failure
    * is a data category to aggregate over, not an exception.
    */
  def decodeImages(assets: Dataset[MediaAsset]): Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      ImageCodec.decode(a.payload) match {
        case Some(img) =>
          DecodedImage(a.asset_id, decoded = true,
            ImageCodec.formatName(a.payload).getOrElse("unknown"),
            img.getWidth, img.getHeight, ImageCodec.channels(img),
            ImageCodec.meanLuma(img))
        case None =>
          DecodedImage(a.asset_id, decoded = false, "undecodable",
            a.width, a.height, 0, -1.0)
      }
    })
  }

  final case class ResizedImage(
      asset_id: Long, decoded: Boolean, src_w: Int, src_h: Int,
      out_w: Int, out_h: Int, n_bytes_out: Long, png: Array[Byte])

  /** REAL resize execution: decode → aspect-fit into `maxW`×`maxH`
    * (same scale arithmetic as [[resizePlan]], applied to the TRUE
    * decoded dims — never upscales) → bilinear rescale → lossless
    * PNG re-encode. One asset at a time through the iterator; the
    * output payload is the re-encoded PNG, so the stage composes
    * with a downstream write or a second decode. Undecodable
    * payloads pass through `decoded = false` with an empty payload
    * and zero byte count.
    */
  def resizeImages(assets: Dataset[MediaAsset], maxW: Int,
                   maxH: Int): Dataset[ResizedImage] = {
    import assets.sparkSession.implicits._
    require(maxW >= 1 && maxH >= 1, "target box must be positive")
    assets.mapPartitions(_.map { a =>
      ImageCodec.decode(a.payload) match {
        case Some(img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          val scale = math.min(
            math.min(maxW.toDouble / w, maxH.toDouble / h), 1.0)
          val tw = math.max(math.floor(w * scale), 1.0).toInt
          val th = math.max(math.floor(h * scale), 1.0).toInt
          val png = ImageCodec.encodePng(ImageCodec.resize(img, tw, th))
          ResizedImage(a.asset_id, decoded = true, w, h, tw, th,
            png.length.toLong, png)
        case None =>
          ResizedImage(a.asset_id, decoded = false, a.width, a.height,
            a.width, a.height, 0L, Array.emptyByteArray)
      }
    })
  }

  final case class DecodedAudio(
      asset_id: Long, decoded: Boolean, sample_rate: Int,
      channels: Int, n_samples: Long, rms: Double)

  /** REAL audio decode — JDK-only [[AudioCodec]] (WAV/AIFF/AU, the
    * readers every JRE ships), same iterator-per-asset contract as
    * [[decodeImages]]. Emits the TRUE sample rate / channel count /
    * sample count from the decoded stream (the metadata columns are
    * what the upstream claims; a crawled corpus lies) plus the RMS
    * amplitude as the decoded-real-samples statistic. Payloads the
    * JDK cannot parse — corrupt bytes, compressed codecs, the text
    * test double — come back `decoded = false` with the claimed
    * metadata passed through: decode failure is a data category to
    * aggregate over, not an exception.
    */
  def decodeAudio(assets: Dataset[MediaAsset]): Dataset[DecodedAudio] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      AudioCodec.decode(a.payload) match {
        case Some(d) =>
          DecodedAudio(a.asset_id, decoded = true, d.sampleRate,
            d.channels, d.samples.length.toLong, AudioCodec.rms(d.samples))
        case None =>
          DecodedAudio(a.asset_id, decoded = false, a.sample_rate, 0, 0L, -1.0)
      }
    })
  }

  final case class ResampledAudio(
      asset_id: Long, decoded: Boolean, src_rate: Int, target_rate: Int,
      n_samples_in: Long, n_samples_out: Long, n_bytes_out: Long,
      wav: Array[Byte])

  /** REAL resample execution — [[resamplePlan]]'s arithmetic applied
    * to the TRUE decoded stream: decode → mono PCM16 → downsample to
    * `targetRate` when the source rate is higher (never upsamples,
    * the plan's rule) → lossless WAV re-encode, one asset at a time
    * through the iterator. The output sample count follows the
    * plan's int64 contract exactly (`n_out = n_in · target div
    * src` — [[AudioCodec.resample]] shares the arithmetic), which is
    * what MultimodalSpec asserts plan-vs-execution. Undecodable
    * payloads pass through `decoded = false` with an empty payload.
    */
  def resampleAudio(assets: Dataset[MediaAsset],
                    targetRate: Int): Dataset[ResampledAudio] = {
    import assets.sparkSession.implicits._
    require(targetRate >= 1, "target rate must be positive")
    assets.mapPartitions(_.map { a =>
      AudioCodec.decode(a.payload) match {
        case Some(d) =>
          val tgt = math.min(d.sampleRate, targetRate)
          val out =
            if (tgt == d.sampleRate) d.samples
            else AudioCodec.resample(d.samples, d.sampleRate, tgt)
          val wav = AudioCodec.encodeWav(out, tgt)
          ResampledAudio(a.asset_id, decoded = true, d.sampleRate, tgt,
            d.samples.length.toLong, out.length.toLong,
            wav.length.toLong, wav)
        case None =>
          ResampledAudio(a.asset_id, decoded = false, a.sample_rate,
            a.sample_rate, 0L, 0L, 0L, Array.emptyByteArray)
      }
    })
  }

  /** Metadata projection over the binary column — the SQL-facing
    * surface (byte length + content hash + typed meta), one
    * codegen'd pass, no decode.
    */
  def metaQuery(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("width"), col("height"), col("sample_rate"), col("n_frames"))

  /** Spread decode work evenly BY BYTES, not by row count: a 50 MB
    * video next to 4 KB thumbnails makes row-hash partitioning skew
    * executors badly. Rows are range-partitioned on (log2 size class,
    * id-hash salt): each partition holds assets of one size class,
    * salted so the heavy classes spread over many partitions — the
    * per-partition byte total is bounded by class width × rows, not
    * by luck.
    */
  def repartitionBySizeClass(assets: DataFrame, numPartitions: Int,
                             payloadCol: String = "payload",
                             idCol: String = "asset_id"): DataFrame =
    assets
      .withColumn("_size_class",
        floor(log2(greatest(length(col(payloadCol)), lit(1)))).cast("int"))
      .withColumn("_salt", pmod(xxhash64(col(idCol)), lit(1024)).cast("int"))
      .repartitionByRange(numPartitions, col("_size_class"), col("_salt"))
      .drop("_size_class", "_salt")

  /** Resize planning for image assets: aspect-preserving fit into
    * `maxW`×`maxH` as ONE codegen'd projection — the part of an
    * image-resize pass that is pure arithmetic on the typed
    * metadata. `scale = min(maxW/w, maxH/h, 1)` (never upscales),
    * target dims floor to at least 1 px, and `resized` marks assets
    * whose payload actually needs decoding: at 100 TB the decode
    * stage filters on it, so already-fitting images never leave the
    * scan. `est_bytes_out` (RGB8) is what the shuffle/write planner
    * sizes output partitions with. Non-image assets pass through
    * unresized (width/height are image metadata).
    */
  def resizePlan(assets: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW >= 1 && maxH >= 1, "target box must be positive")
    val isImage = col("media_type") === "image"
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    val tw = when(isImage,
      greatest(floor(col("width") * scale), lit(1.0))).otherwise(col("width"))
      .cast("int")
    val th = when(isImage,
      greatest(floor(col("height") * scale), lit(1.0))).otherwise(col("height"))
      .cast("int")
    assets.select(col("asset_id"), col("media_type"),
        col("width"), col("height"))
      .withColumn("target_w", tw)
      .withColumn("target_h", th)
      .withColumn("resized",
        col("target_w") =!= col("width") || col("target_h") =!= col("height"))
      .withColumn("est_bytes_out",
        (col("target_w").cast("long") * col("target_h")) * 3L)
  }

  /** Resample planning for audio assets: the sample-rate sibling of
    * [[resizePlan]] — the pure-metadata-arithmetic part of an audio
    * resample pass as ONE codegen'd projection. Downsamples to
    * `targetRate` and never upsamples (the "never upscale" rule: an
    * 8 kHz clip stays 8 kHz under a 16 kHz target), `resampled`
    * marks assets whose payload actually needs the DSP stage (at
    * 100 TB the decode stage filters on it, so already-conforming
    * clips never leave the scan), and the output-size estimates are
    * what the shuffle/write planner sizes partitions with.
    *
    * Sample accounting uses the PCM16-mono stand-in (2 bytes per
    * sample of payload); `est_samples_out = n_in · target div rate`
    * in pure int64 arithmetic — `div`, not double division, so the
    * plan is bit-identical in any engine (a double quotient can
    * round up across an integer boundary and off-by-one the floor).
    * Non-audio assets (and unknown `sample_rate <= 0`) pass through
    * with `resampled = false` and zero output estimates.
    */
  def resamplePlan(assets: DataFrame, targetRate: Int): DataFrame = {
    require(targetRate >= 1, "target rate must be positive")
    val isAudio = col("media_type") === "audio" && col("sample_rate") > 0
    assets.select(col("asset_id"), col("media_type"), col("sample_rate"),
        when(isAudio, expr("cast(length(payload) as bigint) div 2"))
          .otherwise(lit(0L)).as("n_samples_in"),
        when(isAudio, least(col("sample_rate"), lit(targetRate)))
          .otherwise(col("sample_rate")).cast("int").as("target_rate"))
      // coalesce: a NULL sample_rate must read as passthrough-false,
      // not a NULL that both decode-stage filter branches drop
      .withColumn("resampled",
        coalesce(col("target_rate") =!= col("sample_rate"), lit(false)))
      .withColumn("est_samples_out",
        when(col("sample_rate") > 0,
          expr("n_samples_in * cast(target_rate as bigint) div sample_rate"))
          .otherwise(lit(0L)))
      .withColumn("est_bytes_out", col("est_samples_out") * lit(2L))
  }

  final case class ResizedAsset(
      asset_id: Long, target_w: Int, target_h: Int,
      n_bytes_out: Long, content_hash: Long)

  /** Partition-wise resize execution over the [[resizePlan]]
    * dimensions — same iterator-in/iterator-out contract as
    * [[decodeFeatures]]: one asset at a time, payloads never
    * accumulate. STUB pixels (no codecs here): output byte count is
    * the plan's RGB8 estimate and the content hash is a
    * deterministic FNV fold of the payload seeded by the target
    * dims — a real scaler replaces `resizeOne` without touching the
    * plan shape.
    */
  def resizeStub(assets: Dataset[MediaAsset], maxW: Int,
                 maxH: Int): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    require(maxW >= 1 && maxH >= 1, "target box must be positive")
    assets.mapPartitions(_.map(a => resizeOne(a, maxW, maxH)))
  }

  private def resizeOne(a: MediaAsset, maxW: Int, maxH: Int): ResizedAsset = {
    val (tw, th) =
      if (a.media_type != "image") (a.width, a.height)
      else {
        val scale = math.min(math.min(maxW.toDouble / a.width,
          maxH.toDouble / a.height), 1.0)
        (math.max(math.floor(a.width * scale), 1.0).toInt,
          math.max(math.floor(a.height * scale), 1.0).toInt)
      }
    var h = 0xcbf29ce484222325L ^ (tw.toLong << 32 | th.toLong)
    val bytes = a.payload
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    ResizedAsset(a.asset_id, tw, th, tw.toLong * th * 3L, h)
  }

  /** Frame sampling for video assets: every `everyN`-th frame index
    * becomes its own row (sequence+explode — stays inside codegen,
    * no UDF), ready for a per-frame decode. The frame "content" is a
    * deterministic stub slice of the payload; a real codec replaces
    * `frame_hash` with pixel output without touching the plan shape.
    * Non-video assets pass through with a single frame row (idx 0).
    */
  final case class DecodedFrame(
      asset_id: Long, decoded: Boolean, fps: Double, n_frames: Long,
      frame_idx: Long, width: Int, height: Int, mean_luma: Double)

  /** REAL video frame sampling for the one JDK-reachable
    * container/codec pair — MJPEG-in-AVI ([[VideoCodec]]: RIFF walk
    * + imageio JPEG per frame). Every `everyN`-th frame of the TRUE
    * container frame list decodes to pixels and reports real
    * dims/luma — the same everyN arithmetic as the [[sampleFrames]]
    * plan, applied to decoded truth instead of claimed metadata.
    * Payloads that are not MJPEG AVIs (H.264 and friends have no JDK
    * decoder — the declared stub boundary) come back as ONE
    * `decoded = false` row carrying the claimed n_frames, so decode
    * failure stays a data category to aggregate over. Frames whose
    * JPEG bytes are corrupt report `decoded = true` for the asset
    * but `-1` luma for that frame (the container parsed; the frame
    * didn't).
    */
  def decodeVideoFrames(assets: Dataset[MediaAsset],
                        everyN: Int = 30): Dataset[DecodedFrame] = {
    import assets.sparkSession.implicits._
    require(everyN > 0, "everyN must be positive")
    assets.mapPartitions(_.flatMap { a =>
      VideoCodec.decode(a.payload) match {
        case Some(v) =>
          (0 until v.frames.length by everyN).iterator.map { i =>
            ImageCodec.decode(v.frames(i)) match {
              case Some(img) => DecodedFrame(a.asset_id, decoded = true,
                v.fps, v.frames.length.toLong, i.toLong,
                img.getWidth, img.getHeight, ImageCodec.meanLuma(img))
              case None => DecodedFrame(a.asset_id, decoded = true,
                v.fps, v.frames.length.toLong, i.toLong, v.width,
                v.height, -1.0)
            }
          }
        case None => Iterator.single(DecodedFrame(a.asset_id,
          decoded = false, 0.0, a.n_frames.toLong, 0L, a.width,
          a.height, -1.0))
      }
    })
  }

  final case class PerceptualHash(
      asset_id: Long, media_type: String, decoded: Boolean, phash: Long)

  /** 64-bit perceptual signature per asset — the generation side of
    * binary near-dup dedup (the text family has five near-dup
    * operators; this is the asset-side sibling of the exact
    * payload-hash dedup). Assets whose payload DECODES as an image
    * hash by [[ImageCodec.dhash64]] (default) or
    * [[ImageCodec.ahash64]]: re-encodes, rescales and tone shifts of
    * the same picture land within a small Hamming radius.
    * Undecodable payloads (corrupt bytes, non-image media, the text
    * test double) degrade to the first 8 bytes of the payload MD5 —
    * you cannot perceive what you cannot decode, so identity
    * collapses to exact content: byte-identical copies still pair at
    * Hamming 0, and the fallback is portable SQL (the oracle recipe)
    * so the whole pipeline stays oracle-checkable on the text
    * fixture while the decode path is spec-verified on real images.
    * Same iterator-per-asset contract as [[decodeImages]].
    */
  def perceptualHashes(assets: Dataset[MediaAsset],
                       method: String = "dhash"): Dataset[PerceptualHash] = {
    import assets.sparkSession.implicits._
    require(method == "dhash" || method == "ahash",
      s"unknown perceptual hash method '$method' (dhash | ahash)")
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val (decoded, h) = perceptualHashOne(md, a.payload, method)
        PerceptualHash(a.asset_id, a.media_type, decoded, h)
      }
    }
  }

  /** The decode-or-degrade kernel both hash producers share: a
    * decodable image hashes perceptually; anything else degrades to
    * the first 8 MD5 bytes (exact-content identity, the portable
    * oracle recipe). Payload must be non-null (callers filter).
    */
  private def perceptualHashOne(md: java.security.MessageDigest,
                                payload: Array[Byte],
                                method: String): (Boolean, Long) =
    ImageCodec.decode(payload) match {
      case Some(img) =>
        (true, if (method == "ahash") ImageCodec.ahash64(img)
               else ImageCodec.dhash64(img))
      case None =>
        md.reset()
        (false, java.nio.ByteBuffer.wrap(md.digest(payload), 0, 8).getLong)
    }

  /** Column-frame form of [[perceptualHashes]] for callers outside
    * the MediaAsset schema — the incremental member's hash kernel:
    * (idCol: long, payloadCol: binary-castable) → (idCol, phash).
    * Same iterator-per-asset contract; rows with null payloads must
    * be filtered by the caller (retraction is the caller's
    * semantic, not a hash).
    */
  def perceptualHash64(df: DataFrame, idCol: String, payloadCol: String,
                       method: String = "dhash"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(method == "dhash" || method == "ahash",
      s"unknown perceptual hash method '$method' (dhash | ahash)")
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          (id, perceptualHashOne(md, payload, method)._2)
        }
      }
      .toDF(idCol, "phash")
  }

  def sampleFrames(assets: DataFrame, everyN: Int = 30): DataFrame = {
    require(everyN > 0, "everyN must be positive")
    val lastIdx = greatest(col("n_frames") - 1, lit(0)).cast("bigint")
    val idxs = when(col("media_type") === "video",
      sequence(lit(0L), lastIdx, lit(everyN.toLong)))
      .otherwise(array(lit(0L)))
    assets
      .select(col("asset_id"), col("media_type"), col("payload"),
        col("n_frames"), explode_outer(idxs).as("frame_idx"))
      .filter(col("frame_idx").isNotNull) // see Dedup.shingles
      .withColumn("frame_hash",
        // stub per-frame content: hash of a frame-dependent payload slice
        xxhash64(col("payload").substr(
          (pmod(col("frame_idx"), greatest(length(col("payload")), lit(1)))
            + 1).cast("int"), lit(64))))
      .select("asset_id", "media_type", "n_frames", "frame_idx", "frame_hash")
  }
}
