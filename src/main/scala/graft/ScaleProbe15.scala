package graft

/** Manual scale probe (not part of the library API): three ways to read
  * a raster for the arithmetic passes in [[operators.Multimodal]]
  * (imageFeatures channel sums, areaAverage box filter):
  *
  *   1. per-pixel `getRGB(x, y)` — ColorModel dispatch + a transfer
  *      array allocation PER PIXEL on byte rasters;
  *   2. bulk `getRGB(0, 0, w, h, buf, 0, w)` — same per-pixel
  *      conversion loop inside the JDK, just one call;
  *   3. direct DataBufferByte walk (what [[operators.Multimodal.argbOf]]
  *      ships for the layouts ImageIO decodes into) — repack the
  *      interleaved sRGB bytes, no per-pixel dispatch.
  *
  * All three produce identical ARGB ints (asserted), so this is pure
  * constant-factor — but it multiplies by every pixel of every frame of
  * a 100 TB vision corpus. The probe exists because the "obvious" bulk
  * getRGB upgrade measured as a WASH on this JDK; only the raster walk
  * actually pays.
  *
  * No Spark needed: the decode loop is per-partition executor code; the
  * probe times the exact kernels on synthetic rasters.
  */
object ScaleProbe15 {
  def main(args: Array[String]): Unit = {
    val images = 64
    val dim = 512 // 512x512 = 262k pixels per image

    def mkImg(seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        dim, dim, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var s = seed.toLong * 0x9e3779b97f4a7c15L
      var y = 0
      while (y < dim) {
        var x = 0
        while (x < dim) {
          s = s * 6364136223846793005L + 1442695040888963407L
          img.setRGB(x, y, (s >>> 40).toInt)
          x += 1
        }
        y += 1
      }
      img
    }
    val imgs = (0 until images).map(mkImg).toArray

    def time(tag: String)(f: => Long): Long = {
      var out = 0L
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime()
        out = f
        (System.nanoTime() - t0) / 1e9
      }.drop(1).sorted
      println(f"[probe15] $tag: ${runs(1)}%.3f s (median of 3, $images x ${dim}x$dim)")
      out
    }

    def sumPerPixel(img: java.awt.image.BufferedImage): Long = {
      var acc = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          acc += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      acc
    }
    def sumOf(argb: Array[Int]): Long = {
      var acc = 0L
      var i = 0
      while (i < argb.length) {
        val p = argb(i)
        acc += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        i += 1
      }
      acc
    }
    def sumBulkGetRgb(img: java.awt.image.BufferedImage): Long = {
      val buf = new Array[Int](img.getWidth * img.getHeight)
      img.getRGB(0, 0, img.getWidth, img.getHeight, buf, 0, img.getWidth)
      sumOf(buf)
    }

    val a = time("per-pixel getRGB(x,y) channel sums")(imgs.map(sumPerPixel).sum)
    val b = time("bulk getRGB(0,0,w,h,buf,0,w) channel sums")(imgs.map(sumBulkGetRgb).sum)
    val c = time("direct raster walk (argbOf) channel sums")(
      imgs.map(i => sumOf(operators.Multimodal.argbOf(i))).sum)
    assert(a == b && b == c, s"read paths disagree: $a / $b / $c")
    println(s"[probe15] checksums equal: $a")
  }
}
