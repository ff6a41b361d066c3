package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding vectors — the standard 4x
  * memory/bandwidth reduction applied to ANN corpora before indexing
  * (symmetric per-vector scale, the faiss `SQ8`-style scheme).
  *
  * Everything here is ROW-LOCAL: scale, quantize, reconstruct, and the
  * per-vector error metrics are narrow maps with no shuffle; only the
  * final per-label summary aggregates. That is the whole 100 TB story —
  * quantization cost scales with the scan, and the quantized output
  * column is what an IVF/LSH index would store (4x smaller, so 4x more
  * of the corpus fits per executor during candidate refine).
  *
  * Determinism contract (what makes the differential gate work): the
  * quantizer uses `floor(x/s + 0.5)` — floor is exact in both engines,
  * unlike round() whose half-case convention differs — and all sums run
  * left-to-right over the array, so per-vector doubles are bit-identical
  * across engines.
  */
object Quantization {

  /** Per-vector symmetric scale: max|x| / 127 (0 for the zero vector). */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x))) / lit(127.0)

  /** Quantized codes as integer-valued doubles in [-127, 127]. */
  def int8Codes(v: Column, s: Column): Column =
    transform(v, x => floor(x / s + lit(0.5)))

  /** Dequantized reconstruction: codes * scale. */
  def dequantize(codes: Column, s: Column): Column =
    transform(codes, q => q * s)

  /** Per-label quantization quality summary over an embedding frame:
    * (label, n, avg_mse_ppm, avg_cos, q_checksum) where avg_mse_ppm is
    * the mean squared reconstruction error x 1e6, avg_cos the mean
    * cosine between original and reconstruction, and q_checksum the
    * exact integer sum of all quantized codes (a bit-level regression
    * tripwire). Zero vectors (scale 0) are excluded.
    * Metric columns are left unrounded — callers canonicalize.
    */
  def int8SummaryByLabel(emb: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    val v = toDouble(col(vecCol))
    val withRec = emb
      .select(col(labelCol).as("label"), v.as("v"), int8Scale(v).as("s"))
      .filter(col("s") > 0)
      .withColumn("rec", dequantize(int8Codes(col("v"), col("s")), col("s")))
    val mse = expr("aggregate(zip_with(v, rec, (a, b) -> (a - b) * (a - b)), 0d, (acc, x) -> acc + x)") /
      size(col("v"))
    val qsum = expr("aggregate(v, 0d, (acc, x) -> acc + floor(x / s + 0.5d))").cast("long")
    withRec
      .select(col("label"), mse.as("mse"),
        (dot(col("v"), col("rec")) / (norm(col("v")) * norm(col("rec")))).as("cos"),
        qsum.as("qsum"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        (avg(col("mse")) * lit(1e6)).as("avg_mse_ppm"),
        avg(col("cos")).as("avg_cos"),
        sum(col("qsum")).as("q_checksum"))
  }
}
