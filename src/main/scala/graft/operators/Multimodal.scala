package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.12 L5): media as opaque
  * `BinaryType` content plus typed metadata, flowing through the engine like
  * any other column. The EDI fixture corpus doubles as the binary fixture.
  *
  * The actual media decoding (image/audio codecs) sits behind the
  * [[MediaCodec]] trait — a real deployment passes a codec-backed
  * implementation; the default [[ByteHistogramCodec]] is the
  * deterministic sandbox stub (the container has no media libraries). The
  * Spark-side contract is real and tested either way: schema, batch
  * shape, per-partition session lifecycle, and partition-preserving
  * execution are exactly what the codec-backed implementation uses; only
  * the byte->pixels session body changes.
  *
  * Scale posture: `binaryFile` scans are split per file (no shuffle);
  * feature extraction is `mapPartitions` (narrow, codegen-adjacent); nothing
  * ever collects content to the driver.
  */
object Multimodal {

  /** Read a directory of opaque media files: (path, modificationTime,
    * length, content) — Spark's built-in binary source. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Typed manifest: per-file id (basename), byte length, sha256. All
    * computed executor-side with native expressions. */
  def manifest(binaries: DataFrame): DataFrame =
    binaries.select(
      regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
      col("length").as("n_bytes"),
      sha2(col("content"), 256).as("sha256"))

  /** One extracted feature row per media item. */
  final case class MediaFeatures(
      fileName: String,
      nBytes: Long,
      kind: String,          // sniffed container type
      features: Array[Float] // fixed-dim embedding (stub: byte histogram)
  )

  val FeatureDim = 16

  /** Decode + featurize through the [[MediaCodec]] seam (default: the
    * sandbox stub). The partition-iterator shape is the real contract: the
    * codec session — native decoder handle, model weights — is opened once
    * per partition (the expensive part), items stream through it, and it
    * closes when the partition is exhausted.
    */
  def extractFeatures(
      spark: SparkSession, binaries: DataFrame,
      codec: MediaCodec = ByteHistogramCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    binaries
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fileName"),
        col("length").as("nBytes"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions { it =>
        val session = codec.openSession() // per-partition init
        val out = it.map { case (name, n, bytes) =>
          MediaFeatures(name, n, sniffKind(bytes), session.decodeFeatures(bytes))
        }
        closeOnExhaustion(out, session)
      }
  }

  /** Wrap a partition iterator so the codec session closes once the last
    * element is consumed (close() is idempotent per the MediaCodec
    * contract, so repeated hasNext after exhaustion is safe).
    */
  private def closeOnExhaustion[T](
      it: Iterator[T], session: MediaCodec.Session): Iterator[T] =
    new Iterator[T] {
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) session.close()
        h
      }
      override def next(): T = it.next()
    }

  /** Container sniffing by magic bytes — genuinely implementable without
    * codecs; unknown types pass through as "bin". */
  def sniffKind(bytes: Array[Byte]): String =
    if (bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "riff"
    else if (bytes.length >= 2 && bytes(0) == 'S' && bytes(1) == 'T') "x12"
    else "bin"

  /** Frame sampling through the [[MediaCodec]] seam: every media item
    * yields `n` evenly spaced frames (stub: byte windows; a video codec
    * emits decoded frames) with the (file_name, frame_no, frame_bytes)
    * schema and the one-to-many explode shape of a video pipeline.
    */
  def sampleFrames(
      spark: SparkSession, binaries: DataFrame, n: Int,
      codec: MediaCodec = ByteHistogramCodec): DataFrame = {
    import spark.implicits._
    binaries
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val session = codec.openSession() // per-partition init
        val out = it.flatMap { case (name, bytes) =>
          session.sampleFrames(bytes, n).iterator.zipWithIndex
            .map { case (fb, i) => (name, i, fb) }
        }
        closeOnExhaustion(out, session)
      }
      .toDF("file_name", "frame_no", "frame_bytes")
  }
}
