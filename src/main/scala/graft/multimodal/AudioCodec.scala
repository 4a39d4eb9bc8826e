package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}

/** JDK-only audio codec: the REAL decode step behind the multimodal
  * audio surface. Every JRE ships `javax.sound.sampled` readers for
  * WAV/AIFF/AU containers with PCM (and ULAW/ALAW) encodings, so —
  * like [[ImageCodec]] — this needs no external native libraries;
  * it is the public-knowledge equivalent of the codec stage a
  * 100 TB media pipeline runs (reference: ingest-framework's media
  * columns are opaque binaries decoded downstream). Compressed
  * codecs (MP3/AAC/Opus) are NOT in the JDK and stay out of scope.
  *
  * Executor-side contract, as the image codec: every method is a
  * pure function of its argument, safe from `mapPartitions`
  * closures; corrupt or non-audio payloads decode to None (data,
  * not exceptions); a header-declared frame count past [[maxSamples]]
  * is rejected BEFORE allocation (the decompression-bomb guard — a
  * few-KB WAV header can claim hours of audio).
  */
object AudioCodec {

  /** Decoded, 16-bit-normalized, MONO samples plus the source
    * format's true metadata (channels before the mono mixdown).
    */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
                                samples: Array[Short])

  /** Sample budget for [[decode]]: mono samples after mixdown.
    * 100 M samples ≈ 200 MB PCM16 ≈ 35 min at 48 kHz — above any
    * legitimate clip in an asset pipeline, small enough that one
    * hostile header cannot OOM an executor.
    */
  val maxSamples: Long = 100L * 1000 * 1000

  /** Decode any JRE-supported audio container/encoding to PCM16
    * mono. Multi-channel input mixes down by per-frame channel
    * average (the conventional mono fold); non-16-bit encodings
    * (8-bit PCM, ULAW/ALAW) are converted through the JDK's own
    * format-conversion providers so the sample contract is uniform.
    * None for bytes that are not parseable audio or whose header
    * declares more than [[maxSamples]].
    */
  def decode(payload: Array[Byte]): Option[DecodedAudio] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val channels = src.getChannels
        val frames = in.getFrameLength
        if (channels <= 0 || frames < 0 ||
            frames * channels > maxSamples) None
        else {
          // normalize to signed 16-bit little-endian at the SOURCE
          // rate/channel count — decode never resamples, that's a
          // separate, planned stage
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, channels, 2 * channels,
            src.getSampleRate, false)
          val pcm =
            if (src.matches(target)) in
            else AudioSystem.getAudioInputStream(target, in)
          val bytes = pcm.readAllBytes()
          val nFrames = bytes.length / (2 * channels)
          val mono = new Array[Short](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0L
            var c = 0
            while (c < channels) {
              val o = (f * channels + c) * 2
              acc += ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
              c += 1
            }
            mono(f) = (acc / channels).toShort
            f += 1
          }
          Some(DecodedAudio(math.round(src.getSampleRate), channels, mono))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Linear-interpolation resample of PCM16 mono samples. The output
    * LENGTH is the resample plan's int64 contract exactly:
    * `n_out = n_in * dstRate div srcRate` — so a plan row and the
    * executed stage can be asserted equal sample-for-sample-count.
    * Source positions are exact rationals (`i*src/dst` as int64
    * quotient + remainder), so no float accumulates across the clip
    * and the kernel is bit-deterministic on any executor. Upsampling
    * is the caller's decision; the kernel itself is direction-
    * agnostic.
    */
  def resample(samples: Array[Short], srcRate: Int, dstRate: Int): Array[Short] = {
    require(srcRate >= 1 && dstRate >= 1, "rates must be positive")
    if (srcRate == dstRate) return samples.clone()
    val nOut = (samples.length.toLong * dstRate / srcRate).toInt
    val out = new Array[Short](nOut)
    var i = 0
    while (i < nOut) {
      val posNum = i.toLong * srcRate
      val idx = (posNum / dstRate).toInt
      val frac = (posNum % dstRate).toDouble / dstRate
      val a = samples(idx).toDouble
      val b = (if (idx + 1 < samples.length) samples(idx + 1) else samples(idx)).toDouble
      val v = math.rint(a + (b - a) * frac)
      out(i) = math.max(Short.MinValue.toDouble,
        math.min(Short.MaxValue.toDouble, v)).toShort
      i += 1
    }
    out
  }

  /** Root-mean-square amplitude normalized to [0, 1] — the "did we
    * decode real samples" statistic the spec pins against generated
    * sine fixtures (a full-scale sine has RMS ≈ 1/√2).
    */
  def rms(samples: Array[Short]): Double = {
    if (samples.isEmpty) return 0.0
    var s = 0.0
    var i = 0
    while (i < samples.length) {
      val x = samples(i).toDouble / 32768.0
      s += x * x
      i += 1
    }
    math.sqrt(s / samples.length)
  }

  /** PCM16 mono WAV re-encode (JRE writer) — the output payload of
    * the executed resample stage, decodable by [[decode]] (the
    * round-trip the spec asserts).
    */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate >= 1, "sample rate must be positive")
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val in = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    finally in.close()
    bos.toByteArray
  }
}
