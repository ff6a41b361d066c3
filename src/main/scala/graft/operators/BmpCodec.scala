package graft.operators

/** A REAL (dependency-free) image decoder behind the [[MediaCodec]] seam:
  * uncompressed 24-bit BMP (BITMAPINFOHEADER). Proves the L5 plumbing
  * against actual binary payloads — bottom-up row order, BGR channel
  * order, and 4-byte row padding are all load-bearing: the q132 gate's
  * channel-weighted cell sums change if any of them is mishandled —
  * where [[ByteHistogramCodec]] only proves the Spark-side shapes.
  *
  * Features: a 4x4 spatial grid (16 = [[featureDim]] cells; cell index
  * gy*4+gx with gx = x*4/w, gy = y*4/h in integer arithmetic, y from the
  * TOP) of channel-weighted pixel sums b + 2g + 4r. The weights make the
  * feature sensitive to channel ORDER (an RGB/BGR swap flips b and r);
  * sums are exact integers (<= 16k px * 1785 < 2^24), so they survive
  * the Float feature type losslessly and the oracle can recompute them
  * with integer arithmetic alone.
  *
  * Frames: n evenly spaced pixel ROWS (top y_i = i*(h-1)/(n-1)),
  * returned as the row's w*3 stored bytes (BGR, stride padding
  * stripped) — the image analog of the video sampler's evenly spaced
  * frames, and the shape a thumbnail/banding pipeline consumes.
  *
  * The session carries a reusable row buffer — actual per-partition
  * state, exercising the open-once/close-on-exhaustion lifecycle with
  * more than a no-op.
  */
object BmpCodec extends MediaCodec {

  override val featureDim: Int = 16

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Parsed header: (dataOffset, width, height, stride). Throws on
    * anything but the supported uncompressed 24-bit bottom-up form —
    * loud beats a silently garbage decode.
    */
  private def header(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: missing BM magic")
    val dataOffset = le32(bytes, 10)
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"unsupported BMP variant: bpp=$bpp compression=$compression (24-bit uncompressed only)")
    require(width > 0 && height > 0, s"unsupported BMP dims: ${width}x$height")
    val stride = ((width * 3 + 3) / 4) * 4
    require(bytes.length >= dataOffset + stride * height,
      s"truncated BMP: need ${dataOffset + stride * height} bytes, have ${bytes.length}")
    (dataOffset, width, height, stride)
  }

  override def openSession(): MediaCodec.Session = new MediaCodec.Session {

    // reusable scratch row (grown on demand): per-partition state the
    // lifecycle contract exists for
    private var rowBuf: Array[Byte] = Array.emptyByteArray

    private def rowBytes(bytes: Array[Byte], dataOffset: Int,
        width: Int, height: Int, stride: Int, yTop: Int): Array[Byte] = {
      // bottom-up storage: top row y is stored row height-1-y
      val srcOff = dataOffset + (height - 1 - yTop) * stride
      val out = new Array[Byte](width * 3)
      System.arraycopy(bytes, srcOff, out, 0, width * 3)
      out
    }

    override def decodeFeatures(bytes: Array[Byte]): Array[Float] = {
      val (dataOffset, width, height, stride) = header(bytes)
      if (rowBuf.length < stride) rowBuf = new Array[Byte](stride)
      val sums = new Array[Long](featureDim)
      var y = 0
      while (y < height) {
        val srcOff = dataOffset + (height - 1 - y) * stride
        System.arraycopy(bytes, srcOff, rowBuf, 0, stride)
        val gy = y * 4 / height
        var x = 0
        while (x < width) {
          val b = rowBuf(x * 3) & 0xff
          val g = rowBuf(x * 3 + 1) & 0xff
          val r = rowBuf(x * 3 + 2) & 0xff
          sums(gy * 4 + x * 4 / width) += b + 2L * g + 4L * r
          x += 1
        }
        y += 1
      }
      sums.map(_.toFloat)
    }

    override def sampleFrames(bytes: Array[Byte], n: Int): IndexedSeq[Array[Byte]] = {
      val (dataOffset, width, height, stride) = header(bytes)
      val span = math.max(1, n - 1)
      (0 until n).map { i =>
        val yTop = i * (height - 1) / span
        rowBytes(bytes, dataOffset, width, height, stride, yTop)
      }
    }
  }
}
