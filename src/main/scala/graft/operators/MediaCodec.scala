package graft.operators

/** The pluggable decode seam for the multimodal operators (SURVEY §2.12
  * L5): everything Spark-side — binary scan, schema, partition-preserving
  * `mapPartitions`, explode shape — is real and fixed; the byte→media
  * work is behind this trait so a real deployment drops in a codec-backed
  * implementation (JNI image/audio/video libraries) without touching the
  * operators. The bundled [[ByteHistogramCodec]] is the deterministic
  * in-sandbox stub (this container ships no media libraries).
  *
  * Lifecycle contract: the codec object itself is Serializable (it is
  * captured by the task closure); all expensive state — native decoder
  * handles, model weights — belongs in the [[MediaCodec.Session]] opened
  * ONCE PER PARTITION executor-side and closed when the partition is
  * exhausted. `close()` must be idempotent.
  */
trait MediaCodec extends Serializable {

  /** Dimension of the feature vectors [[MediaCodec.Session.decodeFeatures]]
    * returns. */
  def featureDim: Int

  /** Open per-partition decode state (executor-side). */
  def openSession(): MediaCodec.Session
}

object MediaCodec {

  /** Per-partition decode session; see the lifecycle contract on
    * [[MediaCodec]]. */
  trait Session extends AutoCloseable {

    /** Fixed-dimension feature vector for one media item (a codec-backed
      * implementation decodes, then embeds). */
    def decodeFeatures(bytes: Array[Byte]): Array[Float]

    /** `n` evenly spaced frames for one media item (a video codec emits
      * decoded frames). */
    def sampleFrames(bytes: Array[Byte], n: Int): IndexedSeq[Array[Byte]]

    override def close(): Unit = ()
  }
}

/** The sandbox stub codec: deterministic, codec-free stand-ins with the
  * same shapes a real implementation would have — features are a
  * normalized byte histogram, frames are evenly spaced 64-byte windows
  * (start offset `floor(i * max(len-64, 0) / (n-1))`, the arithmetic the
  * q92 oracle independently recomputes). Stateless, so the session is
  * trivial — which is exactly what makes it a stub and not a codec.
  */
object ByteHistogramCodec extends MediaCodec {

  val FrameWindow = 64

  override val featureDim: Int = 16

  override def openSession(): MediaCodec.Session = new MediaCodec.Session {

    override def decodeFeatures(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](featureDim)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) % featureDim) += 1f; i += 1 }
      val total = math.max(1f, bytes.length.toFloat)
      var j = 0
      while (j < featureDim) { hist(j) /= total; j += 1 }
      hist
    }

    override def sampleFrames(bytes: Array[Byte], n: Int): IndexedSeq[Array[Byte]] = {
      val g = math.max(bytes.length - FrameWindow, 0).toLong
      val span = math.max(1, n - 1).toLong
      (0 until n).map { i =>
        val start = (i * g / span).toInt // non-negative, so floor == int div
        bytes.slice(start, math.min(start + FrameWindow, bytes.length))
      }
    }
  }
}
