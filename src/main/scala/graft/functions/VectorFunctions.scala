package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType embedding columns. The dot product is a
  * custom codegen'd Catalyst expression (DotProduct) — the higher-order
  * function formulation is CodegenFallback and its interpreted inner loop
  * dominated all-pairs similarity cost (SURVEY.md §2.12 L3, §4.3).
  *
  * All math is done in DOUBLE: a sequential left-to-right accumulation,
  * which keeps results bit-deterministic for a given array (and matches the
  * DuckDB oracle's list_inner_product on DOUBLE[]).
  */
object VectorFunctions {

  /** Cast a float array to double (exact) so products/sums are double-math. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotProduct.column(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (avoids recomputing norms per pair). */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}
