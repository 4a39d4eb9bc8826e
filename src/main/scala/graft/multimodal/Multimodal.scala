package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2 #38): image/audio/video treated
  * as opaque `binary` payloads plus typed metadata, with decode /
  * feature-extraction as partition-wise batch processing.
  *
  * The decode step is a STUB — media codecs are not available in this
  * environment — replaced by a deterministic fake (byte-histogram
  * moments). Everything around it is the real Spark plumbing a
  * 100 TB media pipeline needs: a typed payload schema, a
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

  /** Frame sampling for video assets: every `everyN`-th frame index
    * becomes its own row (sequence+explode — stays inside codegen,
    * no UDF), ready for a per-frame decode. The frame "content" is a
    * deterministic stub slice of the payload; a real codec replaces
    * `frame_hash` with pixel output without touching the plan shape.
    * Non-video assets pass through with a single frame row (idx 0).
    */
  def sampleFrames(assets: DataFrame, everyN: Int = 30): DataFrame = {
    require(everyN > 0, "everyN must be positive")
    val lastIdx = greatest(col("n_frames") - 1, lit(0)).cast("bigint")
    val idxs = when(col("media_type") === "video",
      sequence(lit(0L), lastIdx, lit(everyN.toLong)))
      .otherwise(array(lit(0L)))
    assets
      .select(col("asset_id"), col("media_type"), col("payload"),
        col("n_frames"), explode(idxs).as("frame_idx"))
      .withColumn("frame_hash",
        // stub per-frame content: hash of a frame-dependent payload slice
        xxhash64(col("payload").substr(
          (pmod(col("frame_idx"), greatest(length(col("payload")), lit(1)))
            + 1).cast("int"), lit(64))))
      .select("asset_id", "media_type", "n_frames", "frame_idx", "frame_hash")
  }
}
