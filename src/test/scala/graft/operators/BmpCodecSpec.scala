package graft.operators

import graft.fixtures.BmpFixtures
import org.scalatest.funsuite.AnyFunSuite

/** BmpCodec: a real decoder must reproduce the fixture generator's pixel
  * formula through actual bottom-up / BGR / stride-padded bytes — and
  * fail loudly on anything it can't decode.
  */
class BmpCodecSpec extends AnyFunSuite {

  private def expectedCellSums(k: Int): Array[Long] = {
    val (w, h) = BmpFixtures.dims(k)
    val sums = new Array[Long](16)
    for (y <- 0 until h; x <- 0 until w) {
      val b = (11 * k + 3 * x + 7 * y) % 256
      val g = (13 * k + 5 * x + 11 * y) % 256
      val r = (17 * k + 7 * x + 13 * y) % 256
      sums((y * 4 / h) * 4 + x * 4 / w) += b + 2L * g + 4L * r
    }
    sums
  }

  test("decodeFeatures reproduces the generator formula for every fixture image") {
    val session = BmpCodec.openSession()
    try {
      for (k <- 0 until BmpFixtures.NumFiles) {
        val got = session.decodeFeatures(BmpFixtures.render(k)).map(_.toLong)
        assert(got.toSeq == expectedCellSums(k).toSeq, s"file $k cell sums diverged")
      }
    } finally session.close()
  }

  test("sampleFrames returns the stored BGR bytes of evenly spaced top-coordinate rows") {
    val k = 3
    val (w, h) = BmpFixtures.dims(k)
    val session = BmpCodec.openSession()
    try {
      val frames = session.sampleFrames(BmpFixtures.render(k), 5)
      assert(frames.size == 5)
      frames.zipWithIndex.foreach { case (row, i) =>
        val y = i * (h - 1) / 4
        assert(row.length == w * 3, s"frame $i: stride padding must be stripped")
        for (x <- 0 until w) {
          assert((row(x * 3) & 0xff) == (11 * k + 3 * x + 7 * y) % 256, s"b at ($x,$y)")
          assert((row(x * 3 + 1) & 0xff) == (13 * k + 5 * x + 11 * y) % 256, s"g at ($x,$y)")
          assert((row(x * 3 + 2) & 0xff) == (17 * k + 7 * x + 13 * y) % 256, s"r at ($x,$y)")
        }
      }
    } finally session.close()
  }

  test("malformed inputs fail loudly, never decode garbage") {
    val session = BmpCodec.openSession()
    try {
      intercept[IllegalArgumentException](
        session.decodeFeatures("not a bitmap at all".getBytes))
      // valid header, truncated pixel data
      val truncated = BmpFixtures.render(0).take(60)
      intercept[IllegalArgumentException](session.decodeFeatures(truncated))
      // 8-bit BMP is unsupported (bpp field patched)
      val bpp8 = BmpFixtures.render(0).clone()
      bpp8(28) = 8
      intercept[IllegalArgumentException](session.decodeFeatures(bpp8))
    } finally session.close()
  }
}
