package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** JDK-only image codec: the REAL decode step behind the multimodal
  * surface. Every JRE ships ImageIO readers/writers for PNG, JPEG,
  * GIF and BMP, so this needs no external native libraries — the
  * public-knowledge equivalent of the codec stage a 100 TB media
  * pipeline would run (reference: ingest-framework's media columns
  * are opaque binaries decoded downstream).
  *
  * Executor-side contract: every method is a pure function of its
  * byte/image argument, safe to call from `mapPartitions` closures
  * (ImageIO creates a fresh reader per call). The disk-backed
  * ImageIO cache is disabled once per JVM — an executor decoding
  * thousands of payloads must not write scratch files per image.
  */
object ImageCodec {

  // one-time, per-JVM: in-memory streams only, and never touch a
  // display (executors are headless)
  locally {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  /** Pixel budget for [[decode]]: a raster is rejected (None)
    * before allocation when width·height exceeds this. A crafted
    * few-KB PNG can declare 40000×40000 in its header; fully
    * decoding it allocates a multi-GB raster and the resulting
    * OutOfMemoryError is an Error no decode-failure catch sees —
    * one hostile asset would kill the executor. 100 MPix ≈ 400 MB
    * ARGB, comfortably above any legitimate crawled image.
    */
  val maxPixels: Long = 100L * 1000 * 1000

  /** Decode any JRE-supported image format. None for bytes that are
    * not a parseable image (the text-payload test double takes this
    * branch) or whose HEADER declares a raster beyond [[maxPixels]]
    * (the decompression-bomb guard — dimensions are read from the
    * header before any pixel allocation) — decode failure is data,
    * not an exception, because at scale some slice of a crawled
    * corpus is always corrupt or hostile.
    */
  def decode(payload: Array[Byte]): Option[BufferedImage] =
    try {
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(in)
          try {
            val (w, h) = (r.getWidth(0).toLong, r.getHeight(0).toLong)
            if (w <= 0 || h <= 0 || w * h > maxPixels) None
            else Option(r.read(0))
          } finally r.dispose()
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Container format sniffed from the payload bytes ("png",
    * "JPEG", ...) without a full decode — magic-byte dispatch via
    * the registered readers.
    */
  def formatName(payload: Array[Byte]): Option[String] =
    try {
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(in)
        if (readers.hasNext) Some(readers.next().getFormatName.toLowerCase)
        else None
      } finally in.close()
    } catch { case _: Exception => None }

  /** Color channels incl. alpha (3 = RGB, 4 = ARGB, 1 = gray). */
  def channels(img: BufferedImage): Int =
    img.getColorModel.getNumComponents

  /** Mean luma (Rec. 601 weights) over all pixels in [0, 255] — the
    * "did we decode real pixels" statistic the spec pins against
    * known-color fixtures.
    */
  def meanLuma(img: BufferedImage): Double = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sum += 0.299 * r + 0.587 * g + 0.114 * b
        x += 1
      }
      y += 1
    }
    sum / math.max(w.toLong * h, 1L)
  }

  /** Bilinear aspect-free resize to exactly (tw, th) — the caller
    * (resizePlan arithmetic) owns aspect preservation. Output is
    * TYPE_INT_RGB: alpha is composited away so the re-encode is a
    * fixed 3-channel contract regardless of source color model.
    */
  def resize(img: BufferedImage, tw: Int, th: Int): BufferedImage = {
    require(tw >= 1 && th >= 1, "target dims must be positive")
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, tw, th, null)
    } finally g.dispose()
    out
  }

  /** Lossless PNG re-encode (JRE writer). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** JPEG re-encode (JRE writer, default quality) — the lossy
    * sibling [[dhash64]]'s spec fixtures re-compress through.
    */
  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** The (w+1)×h luma grid both perceptual hashes reduce through:
    * bilinear resize (compositing alpha away — [[resize]]'s RGB
    * contract), Rec. 601 luma per cell. Tiny fixed allocation.
    */
  private def lumaGrid(img: BufferedImage, w: Int, h: Int): Array[Double] = {
    val small = resize(img, w, h)
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = small.getRGB(x, y)
        out(y * w + x) = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit DIFFERENCE hash (Krawetz's public dHash): resize to 9×8,
    * one bit per horizontal luma gradient (bit y·8+x set iff
    * luma(x,y) < luma(x+1,y)). Gradient SIGNS survive re-encoding,
    * rescaling and monotone tone shifts (gamma), which is exactly
    * the near-duplicate equivalence class a crawled image corpus
    * needs — MultimodalSpec pins re-encoded/resized/gamma-shifted
    * variants within a small Hamming radius and distinct images far
    * outside it.
    */
  def dhash64(img: BufferedImage): Long = {
    val g = lumaGrid(img, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) < g(y * 9 + x + 1)) bits |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    bits
  }

  /** 64-bit AVERAGE hash (aHash, same public family): resize to 8×8,
    * one bit per cell vs the grid's mean luma. Cheaper mentally,
    * weaker against local tone shifts than [[dhash64]] — shipped for
    * the family completeness the near-dup operator's `method` knob
    * exposes; the operator defaults to dHash.
    */
  def ahash64(img: BufferedImage): Long = {
    val g = lumaGrid(img, 8, 8)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += g(i); i += 1 }
    mean /= 64
    var bits = 0L
    i = 0
    while (i < 64) { if (g(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }
}
