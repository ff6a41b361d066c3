package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.12 L5): media as opaque
  * `BinaryType` content plus typed metadata, flowing through the engine like
  * any other column. The EDI fixture corpus doubles as the binary fixture.
  *
  * The actual media decoding (image/audio codecs) is STUBBED — the
  * container has no media libraries — with a deterministic fake
  * (`stubDecodeFeatures`) so the Spark-side contract is real and tested:
  * schema, batch shape, per-partition batching, and partition-preserving
  * execution are exactly what a codec-backed implementation would use; only
  * the byte->pixels function body would change.
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

  /** STUB decode + featurize: a deterministic byte-histogram "embedding"
    * standing in for a real decoder (???-equivalent marked here). The
    * partition-iterator shape is the real contract: a codec implementation
    * would initialize its native decoder once per partition (the expensive
    * part) and stream items through it, exactly as written.
    */
  def extractFeatures(spark: SparkSession, binaries: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    binaries
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fileName"),
        col("length").as("nBytes"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here (decoder handle, model weights, ...)
        it.map { case (name, n, bytes) =>
          val hist = new Array[Float](FeatureDim)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) % FeatureDim) += 1f; i += 1 }
          val total = math.max(1f, bytes.length.toFloat)
          var j = 0
          while (j < FeatureDim) { hist(j) /= total; j += 1 }
          val kind = sniffKind(bytes)
          MediaFeatures(name, n, kind, hist)
        }
      }
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

  /** STUB frame-sampler: every media item yields `n` evenly spaced "frame"
    * slices (here: byte windows). A video decoder would emit decoded frames
    * with the same (file_name, frame_no, frame_bytes) schema and the same
    * one-to-many explode shape.
    */
  def sampleFrames(spark: SparkSession, binaries: DataFrame, n: Int): DataFrame = {
    val window = 64
    binaries
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("content"))
      .select(col("file_name"),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i => {
          val start = i * greatest(length(col("content")) - window, lit(0)) / lit(math.max(1, n - 1)) + 1
          substring(col("content"), start.cast("int"), lit(window))
        })))
      .select(col("file_name"), col("pos").as("frame_no"), col("col").as("frame_bytes"))
  }
}
