package graft.multimodal

import java.io.ByteArrayOutputStream

import java.awt.image.BufferedImage

/** JDK-only video codec for the ONE container/codec pair reachable
  * without native libraries: MJPEG-in-AVI. An AVI file is a RIFF
  * chunk tree; an MJPEG video stream's data chunks (`NNdc`/`NNdb`)
  * each hold one complete JPEG image, which `javax.imageio` decodes
  * — so frame extraction is a pure-JDK RIFF walk plus the existing
  * [[ImageCodec]] per frame (the same public-knowledge wedge
  * security-camera tooling uses; RIFF/AVI and MJPEG layouts are
  * documented in Microsoft's public AVI RIFF reference). Every other
  * codec (H.264/VP9/AV1…) has no JDK decoder and stays a declared
  * stub upstream.
  *
  * Executor-side contract, as [[ImageCodec]]/[[AudioCodec]]: pure
  * functions, corrupt or non-AVI payloads decode to None (data, not
  * exceptions), and a chunk walk that would index past the payload
  * or accumulate more than [[maxFrames]] frame slices aborts to None
  * (the bomb guard — frame slices alias the in-memory payload, so
  * the count is the only amplification vector).
  */
object VideoCodec {

  /** Parsed AVI with its MJPEG frame payloads (one JPEG per frame,
    * sliced from the container). `fps` comes from the main header's
    * microseconds-per-frame; `width`/`height` from the video
    * stream's BITMAPINFOHEADER (negative height = top-down layout,
    * reported positive).
    */
  final case class DecodedVideo(width: Int, height: Int, fps: Double,
                                frames: Vector[Array[Byte]])

  /** Frame-count budget: slices alias the payload, so memory is
    * bounded by the payload either way — this bounds per-frame
    * downstream work a hostile chunk list could inflate.
    */
  val maxFrames: Int = 100000

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def cc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Parse an MJPEG AVI container. None unless the payload is a
    * well-formed RIFF/AVI whose FIRST video stream is MJPEG-coded
    * ('MJPG'/'mjpg'/'dmb1' handlers) with at least the header chunks
    * present. Frames are returned in container order.
    */
  def decode(payload: Array[Byte]): Option[DecodedVideo] = {
    if (payload.length < 12 || cc(payload, 0) != "RIFF" ||
        cc(payload, 8) != "AVI ") return None
    try {
      var width = 0
      var height = 0
      var usPerFrame = 0L
      var strlSeen = 0      // streams appear in hdrl order
      var videoStream = -1  // index of the first MJPEG video stream
      var curStrlIsVideo = false
      val frames = Vector.newBuilder[Array[Byte]]
      var nFrames = 0
      // walk one chunk level; LIST recurses. Malformed sizes throw
      // (caught below) rather than scanning past the payload.
      def walk(from: Int, to: Int): Unit = {
        var o = from
        while (o + 8 <= to) {
          val id = cc(payload, o)
          val sz = u32(payload, o + 4)
          val body = o + 8
          if (sz < 0 || body + sz > to)
            throw new IllegalArgumentException("chunk overruns parent")
          id match {
            case "LIST" if sz >= 4 =>
              val listType = cc(payload, body)
              if (listType == "strl") {
                curStrlIsVideo = false
                walk(body + 4, body + sz.toInt)
                if (curStrlIsVideo && videoStream < 0)
                  videoStream = strlSeen
                strlSeen += 1
              } else walk(body + 4, body + sz.toInt)
            case "avih" if sz >= 4 =>
              usPerFrame = u32(payload, body)
            case "strh" if sz >= 8 =>
              val fccType = cc(payload, body)
              val handler = cc(payload, body + 4)
              if (fccType == "vids" &&
                  Set("MJPG", "mjpg", "dmb1").contains(handler))
                curStrlIsVideo = true
            case "strf" if curStrlIsVideo && videoStream < 0 && sz >= 12 =>
              // first video stream only — a second MJPEG stream must
              // not overwrite the reported dims
              // BITMAPINFOHEADER: biSize, biWidth, biHeight
              width = u32(payload, body + 4).toInt
              height = math.abs(u32(payload, body + 8).toInt)
            case dataId if dataId.length == 4 &&
                dataId(0).isDigit && dataId(1).isDigit &&
                (dataId.endsWith("dc") || dataId.endsWith("db")) =>
              val stream = (dataId(0) - '0') * 10 + (dataId(1) - '0')
              if (videoStream >= 0 && stream == videoStream && sz > 0) {
                nFrames += 1
                if (nFrames > maxFrames)
                  throw new IllegalArgumentException("frame budget")
                frames += java.util.Arrays.copyOfRange(
                  payload, body, body + sz.toInt)
              }
            case _ => // skip unknown chunks (JUNK, idx1, audio, …)
          }
          o = body + sz.toInt + (sz.toInt & 1) // chunks pad to even
        }
      }
      val riffSize = u32(payload, 4)
      walk(12, math.min(payload.length.toLong, 8 + riffSize).toInt)
      val fs = frames.result()
      if (videoStream < 0 || fs.isEmpty) None
      else Some(DecodedVideo(width, height,
        if (usPerFrame > 0) 1e6 / usPerFrame else 0.0, fs))
    } catch { case _: Exception => None }
  }

  /** JPEG-encode one frame (the JDK ships a JPEG writer) — the
    * fixture-side complement of [[decode]], also usable to re-encode
    * processed frames.
    */
  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    // JPEG has no alpha: normalize to 3-band RGB first
    val rgb =
      if (img.getType == BufferedImage.TYPE_3BYTE_BGR) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_3BYTE_BGR)
        val g = c.createGraphics()
        try g.drawImage(img, 0, 0, null) finally g.dispose()
        c
      }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "jpg", out)
    out.toByteArray
  }

  /** Build a minimal spec-conformant MJPEG AVI from frames — the
    * generated-fixture encoder (MultimodalSpec decodes what this
    * writes, the same pattern as the WAV/PNG fixtures). One video
    * stream, no index chunk (players tolerate its absence; the
    * decoder above never needs it).
    */
  def encodeAviMjpeg(frames: Seq[BufferedImage], fps: Int): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(fps >= 1, "fps must be positive")
    val jpegs = frames.map(encodeJpeg)
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    def le32(v: Long): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      fcc(id) ++ le32(body.length.toLong) ++ body ++ pad
    }
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(children.length + 4L) ++ fcc(listType) ++ children
    val maxJpeg = jpegs.map(_.length).max.toLong
    val avih = le32(1000000L / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(jpegs.length.toLong) ++ le32(0) ++ le32(1) ++ le32(maxJpeg) ++
      le32(w.toLong) ++ le32(h.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(1) ++ le32(fps.toLong) ++ le32(0) ++
      le32(jpegs.length.toLong) ++ le32(maxJpeg) ++ le32(0xffffffffL) ++
      le32(0) ++ le32(0) ++ le32((h.toLong << 16) | w.toLong)
    val strf = le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
      le32((24L << 16) | 1L) ++ fcc("MJPG") ++ le32(w.toLong * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length.toLong) ++ body
  }
}
