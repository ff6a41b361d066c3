package graft.fixtures

import java.nio.file.{Files, Paths}

/** Deterministic 24-bit BMP fixture corpus for the q132 real-codec gate:
  * 40 images whose every pixel is a closed-form function of (file id, x,
  * y), so the DuckDB oracle can recompute the decoder's channel-weighted
  * cell sums with integer arithmetic alone — no image library on either
  * side, REAL binary payloads in between. Widths deliberately include
  * non-multiples of 4 (stride padding is load-bearing) and the encoder
  * writes the standard bottom-up row order.
  *
  * Per file k in 0..39 (y measured from the TOP of the image):
  * {{{
  * w = 16 + (7k mod 49), h = 12 + (5k mod 37)
  * b = (11k + 3x +  7y) mod 256
  * g = (13k + 5x + 11y) mod 256
  * r = (17k + 7x + 13y) mod 256
  * }}}
  */
object BmpFixtures {

  val Dir = s"${ClaimFixtures.FixtureRoot}/bmp"
  val NumFiles = 40

  def dims(k: Int): (Int, Int) = (16 + (7 * k) % 49, 12 + (5 * k) % 37)

  /** Encode file k as a standard BITMAPINFOHEADER 24-bit BMP. */
  def render(k: Int): Array[Byte] = {
    val (w, h) = dims(k)
    val stride = ((w * 3 + 3) / 4) * 4
    val dataOffset = 54
    val size = dataOffset + stride * h
    val out = new Array[Byte](size)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, size); le32(10, dataOffset)
    le32(14, 40) // BITMAPINFOHEADER
    le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24)
    le32(30, 0); le32(34, stride * h)
    le32(38, 2835); le32(42, 2835) // 72 DPI, conventional
    var y = 0
    while (y < h) {
      val off = dataOffset + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        out(off + x * 3) = ((11 * k + 3 * x + 7 * y) % 256).toByte
        out(off + x * 3 + 1) = ((13 * k + 5 * x + 11 * y) % 256).toByte
        out(off + x * 3 + 2) = ((17 * k + 7 * x + 13 * y) % 256).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  @volatile private var materialized = false

  /** Write the corpus once per JVM if absent (the ClaimFixtures/
    * AnnFixtures contract: committed outputs, rebuild only when forced).
    */
  def ensure(): Unit = synchronized {
    if (!materialized) {
      val force = sys.env.get("GRAFT_REGEN_FIXTURES").contains("1")
      val dir = Paths.get(Dir)
      if (force || !Files.exists(dir.resolve(s"img${NumFiles - 1}.bmp"))) {
        Files.createDirectories(dir)
        (0 until NumFiles).foreach { k =>
          Files.write(dir.resolve(s"img$k.bmp"), render(k))
        }
      }
      materialized = true
    }
  }
}
