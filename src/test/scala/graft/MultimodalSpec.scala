package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaAsset

class MultimodalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def assets =
    Multimodal.assetsFromDocuments(Tables.load(spark, sf, "documents"))

  test("asset table carries typed binary payloads and metadata") {
    val a = assets
    assert(a.schema("payload").dataType.typeName == "binary")
    val types = a.select("media_type").distinct().as[String].collect().sorted
    assert(types.sameElements(Array("audio", "image", "video")))
  }

  test("decode stub is deterministic and partition-independent") {
    val ds = assets.as[MediaAsset]
    val f1 = Multimodal.decodeFeatures(ds)
      .collect().map(f => (f.asset_id, f.byte_mean, f.head_hash)).sorted
    val f2 = Multimodal.decodeFeatures(ds.repartition(13))
      .collect().map(f => (f.asset_id, f.byte_mean, f.head_hash)).sorted
    assert(f1.sameElements(f2), "features must not depend on partitioning")
    assert(f1.forall { case (_, mean, _) => mean > 0.0 })
  }

  test("features line up with payload byte lengths") {
    val ds = assets.as[MediaAsset]
    val feats = Multimodal.decodeFeatures(ds).toDF()
      .withColumnRenamed("n_bytes", "feat_bytes")
    val bad = feats.join(Multimodal.metaQuery(assets), Seq("asset_id"))
      .filter(col("feat_bytes") =!= col("n_bytes")).count()
    assert(bad == 0, "decode stub byte counts must match the meta projection")
    assert(feats.count() == assets.count())
  }

  test("size-class repartition balances bytes across partitions") {
    val parts = 4
    val sized = Multimodal.repartitionBySizeClass(assets, parts)
    val perPart = sized
      .select(spark_partition_id().as("p"), length(col("payload")).as("b"))
      .groupBy("p").agg(sum("b").as("bytes"))
      .collect().map(_.getLong(1))
    assert(perPart.length == parts, s"expected $parts partitions: ${perPart.length}")
    // row-count preserved, and no partition carries the whole corpus
    assert(sized.count() == assets.count())
    val total = perPart.sum.toDouble
    assert(perPart.max < total * 0.8,
      s"one partition holds ${perPart.max / total} of all bytes: ${perPart.mkString(",")}")
  }

  test("frame sampling emits every Nth frame for video, one row otherwise") {
    val frames = Multimodal.sampleFrames(assets, everyN = 30)
    val videos = assets.filter(col("media_type") === "video")
      .select(col("asset_id"), col("n_frames")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val counts = frames.groupBy("asset_id", "media_type")
      .agg(count(lit(1)).as("n"), max(col("frame_idx")).as("max_idx"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    counts.foreach { case (id, tpe, n, maxIdx) =>
      if (tpe == "video") {
        val expect = (videos(id) - 1) / 30 + 1 // ceil(n_frames / 30)
        assert(n == expect, s"asset $id: $n frame rows, expected $expect")
        assert(maxIdx % 30 == 0 && maxIdx < videos(id))
      } else assert(n == 1 && maxIdx == 0, s"non-video asset $id: $n rows")
    }
    // deterministic stub content
    val h1 = frames.select("asset_id", "frame_idx", "frame_hash").collect().toSet
    val h2 = Multimodal.sampleFrames(assets.repartition(7), 30)
      .select("asset_id", "frame_idx", "frame_hash").collect().toSet
    assert(h1 == h2)
  }

  test("resize plan aspect-fits without upscaling; stub executes the same dims") {
    val plan = Multimodal.resizePlan(assets, 256, 256).collect()
    plan.foreach { r =>
      val (mt, w, h, tw, th) = (r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5))
      if (mt == "image") {
        assert(tw <= 256 && th <= 256, r.toString)       // fits the box
        assert(tw <= w && th <= h, s"never upscale: $r")
        assert(tw >= 1 && th >= 1)
        // aspect preserved within the 1px floor-rounding envelope
        if (tw < w) assert(math.abs(tw.toDouble / w - th.toDouble / h) <
          1.0 / math.min(w, h) + 1e-9, r.toString)
      } else assert(tw == w && th == h, s"non-image passthrough: $r")
      assert(r.getBoolean(6) == (tw != w || th != h))
      assert(r.getLong(7) == tw.toLong * th * 3L)
    }
    // an already-fitting image is NOT marked resized (decode skips it)
    assert(plan.exists(r => r.getString(1) == "image" && !r.getBoolean(6)))
    // the partition-wise stub lands on the plan's dimensions exactly
    val typed = assets.as[MediaAsset]
    val executed = Multimodal.resizeStub(typed, 256, 256)
      .collect().map(r => r.asset_id -> ((r.target_w, r.target_h))).toMap
    plan.foreach { r =>
      assert(executed(r.getLong(0)) == ((r.getInt(4), r.getInt(5))),
        s"plan and execution dims must agree: $r")
    }
    // deterministic under repartitioning
    val a = Multimodal.resizeStub(typed, 256, 256)
      .collect().map(r => (r.asset_id, r.content_hash)).toSet
    val b = Multimodal.resizeStub(typed.repartition(7), 256, 256)
      .collect().map(r => (r.asset_id, r.content_hash)).toSet
    assert(a == b)
  }

  // -- real image codec fixtures: generated in-JVM via the same
  // JDK imageio the codec wraps (no binary files in the repo) --
  private def solidImage(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    graft.multimodal.ImageCodec.encodePng(img)
  }

  private def solidJpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("real image decode reads true pixel dims, not the claimed metadata") {
    // claimed metadata dims are deliberately WRONG (1×1): only a real
    // pixel decode can report the true raster dimensions
    val fixture = Seq(
      MediaAsset(1L, "image", solidImage(320, 200, 0xff0000), 1, 1, 0, 0),
      MediaAsset(2L, "image", solidJpeg(640, 480, 0x808080), 1, 1, 0, 0),
      MediaAsset(3L, "image", solidImage(100, 50, 0xffffff), 1, 1, 0, 0),
      MediaAsset(4L, "image", "not an image at all".getBytes("UTF-8"),
        17, 23, 0, 0)).toDS()
    val out = Multimodal.decodeImages(fixture)
      .collect().map(d => d.asset_id -> d).toMap
    assert(out(1L).decoded && out(1L).width == 320 && out(1L).height == 200)
    assert(out(1L).format == "png" && out(1L).channels == 3)
    // solid red: Rec.601 luma = 0.299 * 255 (png is lossless — exact)
    assert(math.abs(out(1L).mean_luma - 0.299 * 255) < 1e-9, out(1L).toString)
    assert(out(2L).decoded && out(2L).width == 640 && out(2L).height == 480)
    assert(out(2L).format == "jpeg")
    // solid gray 128: jpeg is lossy but a flat field stays within ±2
    assert(math.abs(out(2L).mean_luma - 128.0) < 2.0, out(2L).toString)
    assert(out(3L).decoded && out(3L).mean_luma > 254.0) // white
    // corrupt bytes are a data category: claimed dims pass through
    assert(!out(4L).decoded && out(4L).width == 17 && out(4L).height == 23)
    assert(out(4L).format == "undecodable" && out(4L).channels == 0)
    // deterministic under repartitioning
    val again = Multimodal.decodeImages(fixture.repartition(3))
      .collect().map(d => (d.asset_id, d.width, d.height, d.mean_luma)).toSet
    assert(again == out.values.map(
      d => (d.asset_id, d.width, d.height, d.mean_luma)).toSet)
  }

  test("real MJPEG-AVI video decode samples true frames; other codecs stay the declared stub") {
    // the one JDK-reachable video pair (r16): a generated MJPEG AVI
    // (RIFF walk + imageio JPEG per frame) decodes REAL frames with
    // true dims/luma; anything else stays decoded=false. Fixture:
    // 10 frames whose gray level encodes the frame index, so the
    // sampled rows prove WHICH frames were decoded, not just counts.
    import graft.multimodal.VideoCodec
    def grayFrame(level: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(new java.awt.Color(level, level, level))
        g.fillRect(0, 0, 64, 48)
      } finally g.dispose()
      img
    }
    val avi = VideoCodec.encodeAviMjpeg(
      (0 until 10).map(i => grayFrame(20 * i + 10)), fps = 5)
    // codec-level round trip: container metadata + every frame
    val dec = VideoCodec.decode(avi).get
    assert(dec.width == 64 && dec.height == 48 && dec.frames.length == 10)
    assert(math.abs(dec.fps - 5.0) < 1e-6, s"fps ${dec.fps}")
    // claimed metadata deliberately wrong (1x1, 999 frames): only the
    // real container walk can report truth
    val fixture = Seq(
      MediaAsset(1L, "video", avi, 1, 1, 0, 999),
      MediaAsset(2L, "video", "not a video".getBytes("UTF-8"), 7, 9, 0, 42))
      .toDS()
    val out = Multimodal.decodeVideoFrames(fixture, everyN = 3)
      .collect().groupBy(_.asset_id)
    // everyN arithmetic on the TRUE frame list: ceil(10/3) = indices
    // 0,3,6,9 — matching the sampleFrames plan's sequence(0, n-1, N)
    val rows = out(1L).sortBy(_.frame_idx)
    assert(rows.map(_.frame_idx).toSeq == Seq(0L, 3L, 6L, 9L),
      rows.mkString(","))
    assert(rows.forall(r => r.decoded && r.n_frames == 10L &&
      r.width == 64 && r.height == 48))
    // gray level i*20+10: JPEG is lossy but flat fields hold within 2
    rows.foreach(r => assert(
      math.abs(r.mean_luma - (20 * r.frame_idx + 10)) < 2.0, r.toString))
    // non-AVI payload: ONE stub row, claimed metadata passed through
    val stub = out(2L)
    assert(stub.length == 1 && !stub.head.decoded &&
      stub.head.n_frames == 42L && stub.head.width == 7)
    // deterministic under repartitioning
    val again = Multimodal.decodeVideoFrames(fixture.repartition(3), everyN = 3)
      .collect().map(r => (r.asset_id, r.frame_idx, r.width, r.mean_luma)).toSet
    assert(again == (out(1L) ++ out(2L)).map(
      r => (r.asset_id, r.frame_idx, r.width, r.mean_luma)).toSet)
    // corrupt ONE frame's bytes in place: container still parses,
    // the damaged frame reports luma -1, the rest decode
    val broken = avi.clone()
    val jpegStart = {
      // find the first 00dc chunk's JPEG SOI marker and wreck it
      var i = 12; var found = -1
      while (found < 0 && i < broken.length - 4) {
        if (broken(i) == '0' && broken(i + 1) == '0' &&
            broken(i + 2) == 'd' && broken(i + 3) == 'c') found = i + 8
        i += 1
      }
      found
    }
    assert(jpegStart > 0)
    java.util.Arrays.fill(broken, jpegStart, jpegStart + 8, 0xAB.toByte)
    val crk = Multimodal.decodeVideoFrames(
      Seq(MediaAsset(3L, "video", broken, 1, 1, 0, 0)).toDS(), everyN = 3)
      .collect().sortBy(_.frame_idx)
    assert(crk.forall(_.decoded) && crk.head.mean_luma == -1.0 &&
      crk.drop(1).forall(_.mean_luma >= 0), crk.mkString(","))
  }

  test("real resize executes the plan's dims on actual pixels and re-encodes") {
    // metadata dims set to the TRUE dims so resizePlan's arithmetic
    // and the pixel execution can be compared 1:1
    val fixture = Seq(
      MediaAsset(1L, "image", solidImage(320, 200, 0x4080c0), 320, 200, 0, 0),
      MediaAsset(2L, "image", solidImage(100, 50, 0x123456), 100, 50, 0, 0),
      MediaAsset(3L, "image", "corrupt".getBytes("UTF-8"), 64, 64, 0, 0))
    val ds = fixture.toDS()
    val plan = Multimodal.resizePlan(ds.toDF(), 256, 256)
      .collect().map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5)))).toMap
    val out = Multimodal.resizeImages(ds, 256, 256)
      .collect().map(r => r.asset_id -> r).toMap
    // plan-vs-execution on ACTUAL pixel dims: 320×200 → 256×160
    // (scale 0.8), 100×50 already fits → passthrough
    assert(out(1L).decoded && (out(1L).out_w, out(1L).out_h) == ((256, 160)))
    assert(plan(1L) == ((256, 160)) && plan(2L) == ((100, 50)))
    fixture.filter(_.asset_id != 3L).foreach { a =>
      val r = out(a.asset_id)
      assert((r.out_w, r.out_h) == plan(a.asset_id),
        s"plan and pixel execution dims must agree for ${a.asset_id}")
      // the output payload is a REAL png of exactly those dims
      val round = graft.multimodal.ImageCodec.decode(r.png)
      assert(round.exists(i => i.getWidth == r.out_w && i.getHeight == r.out_h),
        s"re-encoded png must round-trip to the target dims: ${a.asset_id}")
      assert(r.n_bytes_out == r.png.length.toLong)
      // a solid-color source resizes to the same solid color
      assert(math.abs(graft.multimodal.ImageCodec.meanLuma(round.get) -
        graft.multimodal.ImageCodec.meanLuma(
          graft.multimodal.ImageCodec.decode(a.payload).get)) < 1.0)
    }
    assert(!out(3L).decoded && out(3L).n_bytes_out == 0L &&
      out(3L).png.isEmpty)
  }

  // -- real audio codec fixtures: generated in-JVM via the same
  // javax.sound.sampled the codec wraps (no binary files in repo) --
  private def sineSamples(rate: Int, n: Int, amp: Double): Array[Short] =
    Array.tabulate(n)(i =>
      math.rint(amp * 32767.0 * math.sin(2 * math.Pi * 440.0 * i / rate))
        .toShort)

  private def sineWav(rate: Int, n: Int, amp: Double): Array[Byte] =
    graft.multimodal.AudioCodec.encodeWav(sineSamples(rate, n, amp), rate)

  /** Stereo PCM16 WAV with the SAME sine on both channels — the mono
    * mixdown must reproduce it.
    */
  private def stereoWav(rate: Int, n: Int, amp: Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val s = sineSamples(rate, n, amp)
    val bytes = new Array[Byte](n * 4)
    for (i <- 0 until n; c <- 0 until 2) {
      bytes((i * 2 + c) * 2) = (s(i) & 0xff).toByte
      bytes((i * 2 + c) * 2 + 1) = ((s(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, 2, 4, rate.toFloat, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos) finally in.close()
    bos.toByteArray
  }

  /** 8-bit UNSIGNED PCM WAV — exercises the JDK conversion provider
    * path (decode normalizes every encoding to signed 16-bit).
    */
  private def pcm8Wav(rate: Int, n: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = Array.tabulate(n)(i =>
      (128 + math.rint(100.0 * math.sin(2 * math.Pi * 440.0 * i / rate))).toByte)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      rate.toFloat, 8, 1, 1, rate.toFloat, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos) finally in.close()
    bos.toByteArray
  }

  test("real audio decode reads true stream params, not the claimed metadata") {
    // claimed sample_rate deliberately WRONG (1): only a real decode
    // can report the container's true rate/channels/sample count
    val fixture = Seq(
      MediaAsset(1L, "audio", sineWav(16000, 1600, 0.5), 0, 0, 1, 0),
      MediaAsset(2L, "audio", stereoWav(8000, 800, 0.5), 0, 0, 1, 0),
      MediaAsset(3L, "audio", pcm8Wav(8000, 400), 0, 0, 1, 0),
      MediaAsset(4L, "audio", "not audio at all".getBytes("UTF-8"),
        0, 0, 44100, 0)).toDS()
    val out = Multimodal.decodeAudio(fixture)
      .collect().map(d => d.asset_id -> d).toMap
    assert(out(1L).decoded && out(1L).sample_rate == 16000 &&
      out(1L).channels == 1 && out(1L).n_samples == 1600L, out(1L).toString)
    // 0.5-amplitude sine over whole periods: RMS = 0.5/sqrt(2) ± 1 LSB
    assert(math.abs(out(1L).rms - 0.5 / math.sqrt(2.0)) < 1e-3,
      out(1L).toString)
    // stereo: true channel count, frame-count samples after mixdown,
    // and the same-sine mixdown preserves the RMS
    assert(out(2L).decoded && out(2L).sample_rate == 8000 &&
      out(2L).channels == 2 && out(2L).n_samples == 800L, out(2L).toString)
    assert(math.abs(out(2L).rms - 0.5 / math.sqrt(2.0)) < 1e-3)
    // 8-bit unsigned converts through the JDK provider
    assert(out(3L).decoded && out(3L).sample_rate == 8000 &&
      out(3L).n_samples == 400L && out(3L).rms > 0.001, out(3L).toString)
    // corrupt bytes are a data category: claimed rate passes through
    assert(!out(4L).decoded && out(4L).sample_rate == 44100 &&
      out(4L).n_samples == 0L && out(4L).rms == -1.0)
    // deterministic under repartitioning
    val again = Multimodal.decodeAudio(fixture.repartition(3))
      .collect().map(d => (d.asset_id, d.n_samples, d.rms)).toSet
    assert(again == out.values.map(d => (d.asset_id, d.n_samples, d.rms)).toSet)
  }

  test("real audio resample executes the plan's int64 sample arithmetic and round-trips") {
    val fixture = Seq(
      MediaAsset(1L, "audio", sineWav(16000, 1601, 0.5), 0, 0, 16000, 0),
      // already at/below target: never upsample
      MediaAsset(2L, "audio", sineWav(8000, 800, 0.5), 0, 0, 8000, 0),
      MediaAsset(3L, "audio", "corrupt".getBytes("UTF-8"), 0, 0, 8000, 0))
      .toDS()
    val out = Multimodal.resampleAudio(fixture, 12000)
      .collect().map(r => r.asset_id -> r).toMap
    // the executed count IS the plan formula on the TRUE decoded
    // count: n_out = n_in * target div src, in int64 (1601 samples
    // makes the quotient non-trivial: 1601*12000 div 16000 = 1200)
    assert(out(1L).decoded && out(1L).src_rate == 16000 &&
      out(1L).target_rate == 12000 && out(1L).n_samples_in == 1601L)
    assert(out(1L).n_samples_out == 1601L * 12000L / 16000L,
      out(1L).toString)
    // round trip: the emitted WAV decodes to the target rate/count,
    // and a sine's RMS survives linear-interp downsampling
    val round = graft.multimodal.AudioCodec.decode(out(1L).wav).get
    assert(round.sampleRate == 12000 &&
      round.samples.length.toLong == out(1L).n_samples_out)
    assert(math.abs(graft.multimodal.AudioCodec.rms(round.samples) -
      0.5 / math.sqrt(2.0)) < 0.01)
    // never upsample: 8 kHz under a 12 kHz target passes through
    assert(out(2L).decoded && out(2L).target_rate == 8000 &&
      out(2L).n_samples_out == out(2L).n_samples_in)
    val round2 = graft.multimodal.AudioCodec.decode(out(2L).wav).get
    assert(round2.sampleRate == 8000 && round2.samples.length == 800)
    // undecodable: empty payload, decoded=false
    assert(!out(3L).decoded && out(3L).wav.isEmpty &&
      out(3L).n_bytes_out == 0L)
  }

  test("resample plan downsamples audio exactly, never upsamples, passes others through") {
    // corpus fixture: every audio asset is 16 kHz -> an 8 kHz target
    // fires the downsample branch on all of them
    val plan = Multimodal.resamplePlan(assets, targetRate = 8000).collect()
    assert(plan.exists(_.getString(1) == "audio"))
    plan.foreach { r =>
      val (mt, rate, nIn, tr) =
        (r.getString(1), r.getInt(2), r.getLong(3), r.getInt(4))
      if (mt == "audio") {
        assert(rate == 16000 && tr == 8000 && r.getBoolean(5), r.toString)
        // exact int64 accounting: floor(nIn * 8000 / 16000) = nIn div 2
        assert(r.getLong(6) == nIn / 2, r.toString)
        assert(r.getLong(7) == (nIn / 2) * 2, r.toString)
      } else {
        assert(tr == rate && !r.getBoolean(5), s"non-audio passthrough: $r")
        assert(nIn == 0L && r.getLong(6) == 0L && r.getLong(7) == 0L)
      }
    }
    // never upsample: a clip already below the target keeps its rate
    val slow = Seq((1L, "audio", "abcdef".getBytes, 0, 0, 8000, 0),
        (2L, "audio", "abcdef".getBytes, 0, 0, 0, 0))
      .toDF("asset_id", "media_type", "payload",
        "width", "height", "sample_rate", "n_frames")
    val rows = Multimodal.resamplePlan(slow, targetRate = 16000)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getInt(4) == 8000 && !rows(1L).getBoolean(5),
      s"below-target clip must keep its rate: ${rows(1L)}")
    assert(rows(1L).getLong(6) == 3L, "passthrough keeps every sample")
    // unknown rate (<=0) is passthrough, not a division crash
    assert(!rows(2L).getBoolean(5) && rows(2L).getLong(6) == 0L)
    // NULL rate is passthrough-FALSE, not a null that both decode
    // filter branches would drop
    val nullRate = Multimodal.resamplePlan(
      slow.withColumn("sample_rate",
        when(col("asset_id") === 2L, lit(null).cast("int"))
          .otherwise(col("sample_rate"))),
      targetRate = 16000).filter(col("asset_id") === 2L).head
    assert(!nullRate.getBoolean(5) && nullRate.getLong(6) == 0L,
      s"null-rate asset must read resampled=false: $nullRate")
  }

  test("resize and resample plans run unchanged on a binary-asset file stream") {
    // the multimodal gold hop: both planners are stateless codegen'd
    // projections, so the SAME transform runs on a readStream of
    // binary-payload files with no watermark or state — streamed
    // output must equal the batch plan over the union of the files
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_mm_stream").toString
    val halves = Seq(assets.filter(col("asset_id") % 2 === 0),
      assets.filter(col("asset_id") % 2 === 1))
    halves.zipWithIndex.foreach { case (h, i) =>
      h.coalesce(1).write.mode("overwrite").parquet(s"$dir/f$i.parquet")
    }
    val stream = spark.readStream.schema(assets.schema)
      .option("recursiveFileLookup", "true").parquet(dir)
    def run(name: String, planned: org.apache.spark.sql.DataFrame): Unit = {
      val q = planned.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), s"$name: stream timed out")
    }
    val tag = System.nanoTime()
    run(s"mm_resize_$tag", Multimodal.resizePlan(stream, 256, 256))
    run(s"mm_resample_$tag", Multimodal.resamplePlan(stream, 8000))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rowsOf(spark.table(s"mm_resize_$tag")) ==
      rowsOf(Multimodal.resizePlan(assets, 256, 256)),
      "streamed resize plan must equal the batch plan")
    assert(rowsOf(spark.table(s"mm_resample_$tag")) ==
      rowsOf(Multimodal.resamplePlan(assets, 8000)),
      "streamed resample plan must equal the batch plan")
  }

  test("perceptual near-dup: re-encode/rescale/gamma variants pair, distinct images and cross-type twins do not") {
    import graft.multimodal.ImageCodec
    // smooth sinusoidal luma fields: resize-robust structure whose
    // gradient signs differ between (a, b) frequency pairs — a solid
    // color would dHash to 0 and collide with every other solid
    def texture(w: Int, h: Int, a: Double, b: Double)
        : java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val lum = (128 + 90 * math.sin(
          2 * math.Pi * (a * x / w + b * y / h))).toInt.max(0).min(255)
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
      }
      img
    }
    def gammaShift(img: java.awt.image.BufferedImage, g: Double)
        : java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(
        img.getWidth, img.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        def f(c: Int): Int =
          (math.pow(c / 255.0, g) * 255.0).round.toInt.max(0).min(255)
        val rgb = img.getRGB(x, y)
        out.setRGB(x, y, (f((rgb >> 16) & 0xff) << 16) |
          (f((rgb >> 8) & 0xff) << 8) | f(rgb & 0xff))
      }
      out
    }
    val base = texture(64, 48, 1.5, 1.0)
    val distinct = texture(64, 48, 3.0, 2.2)
    val hBase = ImageCodec.dhash64(base)
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // the perceptual equivalence class, kernel level: PNG re-encode
    // is pixel-lossless (Hamming 0), JPEG/rescale/gamma land within
    // the radius, a different texture lands far outside
    val reEncoded = ImageCodec.decode(ImageCodec.encodePng(base)).get
    assert(ham(hBase, ImageCodec.dhash64(reEncoded)) == 0)
    val jpeg = ImageCodec.decode(ImageCodec.encodeJpeg(base)).get
    assert(ham(hBase, ImageCodec.dhash64(jpeg)) <= 8)
    val resized = ImageCodec.resize(base, 32, 24)
    assert(ham(hBase, ImageCodec.dhash64(resized)) <= 8)
    val gamma = gammaShift(base, 0.8)
    assert(ham(hBase, ImageCodec.dhash64(gamma)) <= 8)
    assert(ham(hBase, ImageCodec.dhash64(distinct)) >= 16,
      s"distinct textures must not collide: ${
        ham(hBase, ImageCodec.dhash64(distinct))}")
    // aHash: same contract on the lossless/monotone variants
    val aBase = ImageCodec.ahash64(base)
    assert(ham(aBase, ImageCodec.ahash64(reEncoded)) == 0)
    assert(ham(aBase, ImageCodec.ahash64(gamma)) <= 8)
    // operator end to end on a planted asset table: decoded images
    // pair through real dHash, undecodable payloads degrade to the
    // MD5-prefix identity (byte twins pair at Hamming 0), and twins
    // under DIFFERENT media types never pair
    def asset(id: Long, t: String, payload: Array[Byte]) =
      MediaAsset(id, t, payload, 0, 0, 0, 0)
    val rows = Seq(
      asset(1L, "image", ImageCodec.encodePng(base)),
      asset(2L, "image", ImageCodec.encodePng(reEncoded)),
      asset(3L, "image", ImageCodec.encodePng(distinct)),
      asset(4L, "audio", "identical audio payload bytes".getBytes("UTF-8")),
      asset(5L, "audio", "identical audio payload bytes".getBytes("UTF-8")),
      asset(6L, "audio", "a different audio payload".getBytes("UTF-8")),
      asset(7L, "video", "identical audio payload bytes".getBytes("UTF-8")))
    val hashes = graft.Materialize.eager(
      Multimodal.perceptualHashes(rows.toDS()).toDF())
    assert(hashes.filter(col("asset_id").isin(1L, 2L, 3L))
      .select("decoded").as[Boolean].collect().forall(identity))
    assert(!hashes.filter(col("asset_id") >= 4L)
      .select("decoded").as[Boolean].collect().exists(identity))
    val stats = Seq("image", "audio", "video").map { t =>
      graft.operators.Dedup.hammingNearDupFromHashes(
        hashes.filter(col("media_type") === t)
          .select(col("asset_id").as("id"), col("phash").as("simhash")),
        "id", maxHamming = 8, maxBucket = 10000)
    }.reduce(_.unionByName(_))
    val byId = stats.collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toMap
    assert(byId(1L) == ((1L, 1L, 0)), s"1 pairs its re-encode: ${byId(1L)}")
    assert(byId(2L) == ((1L, 1L, 0)), byId(2L).toString)
    assert(byId(3L)._2 == 0L, "distinct image has no near pair")
    assert(byId(4L) == ((1L, 1L, 0)), "byte twins pair at Hamming 0")
    assert(byId(5L) == ((1L, 1L, 0)), byId(5L).toString)
    assert(byId(6L)._2 == 0L)
    assert(byId(7L) == ((0L, 0L, -1)),
      "a byte twin under a different media type must not pair")
  }

  test("asset dedup partitions assets per type and prices the duplicate bytes") {
    val out = graft.operators.MultimodalQueries
      .multimodalDedup(spark, sf).collect()
    val n = assets.count()
    assert(out.map(_.getLong(out(0).fieldIndex("n_copies"))).sum == n,
      "every asset lands in exactly one (hash, type) group")
    // a duplicated payload under the SAME type prices its savings
    out.filter(_.getLong(out(0).fieldIndex("n_copies")) > 1).foreach { r =>
      val copies = r.getLong(r.fieldIndex("n_copies"))
      val bytes = r.getLong(r.fieldIndex("n_bytes"))
      assert(r.getLong(r.fieldIndex("bytes_saved")) == (copies - 1) * bytes)
    }
    // identical bytes under DIFFERENT media types stay separate
    // groups (keyed on the pair, not the hash alone)
    val byHash = out.groupBy(_.getString(out(0).fieldIndex("payload_md5")))
    assert(byHash.exists(_._2.length > 1) ||
      out.length == byHash.size, "type-keyed grouping well-formed")
  }
}
