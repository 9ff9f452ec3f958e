package graft.tools

import java.awt.image.BufferedImage

import graft.ops.Multimodal

/** Measures real-JVM Hamming distances of the aHash vs DCT-pHash tiers
  * under gamma/contrast transforms, to pin MultimodalSpec thresholds
  * with honest margins. */
object ProbeDct {
  def gammaShift(src: BufferedImage, gamma: Double): BufferedImage = {
    val out = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until src.getHeight; x <- 0 until src.getWidth) {
      val rgb = src.getRGB(x, y)
      def m(v: Int) = math.min(255, math.round(255.0 * math.pow(v / 255.0, gamma))).toInt
      out.setRGB(x, y, (m((rgb >> 16) & 0xFF) << 16) | (m((rgb >> 8) & 0xFF) << 8) | m(rgb & 0xFF))
    }
    out
  }

  def linShift(src: BufferedImage, a: Double, b: Double): BufferedImage = {
    val out = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until src.getHeight; x <- 0 until src.getWidth) {
      val rgb = src.getRGB(x, y)
      def m(v: Int) = math.max(0, math.min(255, math.round(a * v + b))).toInt
      out.setRGB(x, y, (m((rgb >> 16) & 0xFF) << 16) | (m((rgb >> 8) & 0xFF) << 8) | m(rgb & 0xFF))
    }
    out
  }

  def blob(): BufferedImage = {
    val img = new BufferedImage(40, 30, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 40) {
      val r = (255 * math.exp(-((x - 10) * (x - 10) + (y - 8) * (y - 8)) / 60.0)).toInt
      val g = (255 * math.exp(-((x - 30) * (x - 30) + (y - 20) * (y - 20)) / 90.0)).toInt
      val b = (128 + 100 * math.sin(x / 6.0) * math.cos(y / 5.0)).toInt
      img.setRGB(x, y, (math.min(255, math.max(0, r)) << 16) |
        (math.min(255, math.max(0, g)) << 8) | math.min(255, math.max(0, b)))
    }
    img
  }

  def smooth(): BufferedImage = {
    val img = new BufferedImage(40, 30, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 40) {
      val r = x * 255 / 39
      val g = y * 255 / 29
      val b = ((x + y) % 40) * 255 / 39
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  def reenc(img: BufferedImage): BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.Codecs.encodeImage(img, "png")))

  /** Seeded random 8x8 luminance grid bilinearly upsampled to 40x30:
    * broadband in exactly the 8x8 low frequencies the DCT hash reads. */
  private def gridTexture(seed: Long, cell: scala.util.Random => Int): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val grid = Array.fill(8, 8)(cell(rnd))
    val img = new BufferedImage(40, 30, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 40) {
      val gx = x * 7.0 / 39
      val gy = y * 7.0 / 29
      val (x0, y0) = (gx.toInt, gy.toInt)
      val (x1, y1) = (math.min(7, x0 + 1), math.min(7, y0 + 1))
      val (fx, fy) = (gx - x0, gy - y0)
      val v = math.round(grid(y0)(x0) * (1 - fy) * (1 - fx) + grid(y0)(x1) * (1 - fy) * fx +
        grid(y1)(x0) * fy * (1 - fx) + grid(y1)(x1) * fy * fx).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  /** Broadband full-contrast texture — the photograph-like case. */
  def texture(seed: Long): BufferedImage =
    gridTexture(seed, rnd => 40 + rnd.nextInt(176))

  /** Broadband texture with a TIGHT luminance range around mid-gray:
    * every aHash cell sits near the global mean (where a gamma map
    * moves the effective threshold through the dense cluster), while
    * the DCT spectrum stays broadband and well-conditioned. */
  def tightTexture(seed: Long, amp: Int): BufferedImage =
    gridTexture(seed, rnd => 128 - amp + rnd.nextInt(2 * amp + 1))

  def main(args: Array[String]): Unit = {
    for ((name, img) <- Seq(("blob", blob()), ("smooth", smooth()),
        ("tex42", texture(42L)), ("tex7", texture(7L)), ("tex13", texture(13L)),
        ("tt42a12", tightTexture(42L, 12)), ("tt7a12", tightTexture(7L, 12)),
        ("tt13a8", tightTexture(13L, 8)), ("tt42a8", tightTexture(42L, 8)),
        ("tt99a10", tightTexture(99L, 10)))) {
      val a0 = Multimodal.perceptualHash(reenc(img))
      val d0 = Multimodal.dctHash(reenc(img))
      val transforms: Seq[(String, BufferedImage)] = Seq(
        "g0.5" -> gammaShift(img, 0.5), "g0.6" -> gammaShift(img, 0.6),
        "g0.7" -> gammaShift(img, 0.7), "g0.8" -> gammaShift(img, 0.8),
        "g1.2" -> gammaShift(img, 1.2), "g1.4" -> gammaShift(img, 1.4),
        "g1.5" -> gammaShift(img, 1.5), "g2.0" -> gammaShift(img, 2.0),
        "c1.5b-40" -> linShift(img, 1.5, -40), "b+60" -> linShift(img, 1.0, 60),
        "a0.6b90" -> linShift(img, 0.6, 90))
      for ((tn, ti) <- transforms) {
        val ah = java.lang.Long.bitCount(a0 ^ Multimodal.perceptualHash(reenc(ti)))
        val dh = java.lang.Long.bitCount(d0 ^ Multimodal.dctHash(reenc(ti)))
        println(f"$name%-7s $tn%-10s ahash $ah%2d  dct $dh%2d")
      }
      val other = reenc(Multimodal.Codecs.renderImage(
        "completely different text entirely".getBytes("UTF-8"), 36, 28))
      println(f"$name%-7s unrelated  ahash ${java.lang.Long.bitCount(a0 ^ Multimodal.perceptualHash(other))}%2d  dct ${java.lang.Long.bitCount(d0 ^ Multimodal.dctHash(other))}%2d")
    }
  }
}
