package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType embedding columns, built from codegen'd
  * higher-order functions (`zip_with` + `aggregate`) — no UDFs, so the
  * expressions stay inside whole-stage codegen (SURVEY.md §2.12 L3).
  *
  * All math is done in DOUBLE: the fold is a sequential left-to-right
  * accumulation, which keeps results bit-deterministic for a given array
  * (and matches the DuckDB oracle's list_inner_product on DOUBLE[]).
  */
object VectorFunctions {

  /** Cast a float array to double (exact) so products/sums are double-math. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (avoids recomputing norms per pair). */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}
