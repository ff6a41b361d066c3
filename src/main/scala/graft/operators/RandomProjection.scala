package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: reduce an embedding column
  * from `dIn` to `dOut` dimensions with a deterministic ±1 sign matrix,
  * y[j] = Σ_d v[d]·s(d,j) / √dOut (Achlioptas 2003's database-friendly
  * JL variant — sign matrices preserve pairwise distances in expectation
  * like Gaussians, at integer-arithmetic cost).
  *
  * The sign matrix is derived, not stored: s(d,j) = parity of the first
  * hex digit of md5("d_j") — any engine (Spark, DuckDB, a Python
  * consumer) re-derives the identical matrix from the dimension indices
  * alone, so projected datasets are reproducible across systems with no
  * side-channel matrix file. The matrix is folded into the expression
  * tree as literals at plan time (dIn×dOut signs — metadata-scale), so
  * projection is entirely row-local: no shuffle, no join, no UDF; each
  * output component is one codegen'd zip_with/aggregate chain and 100 TB
  * of embeddings project at scan speed.
  *
  * Use cases: cheap pre-filter before exact cosine (project to 16 dims,
  * prune, refine in full dimension), index compaction for the IVF path,
  * and distance-preserving sketches for clustering.
  */
object RandomProjection {

  /** Deterministic sign for matrix cell (d 1-based input dim, j 0-based
    * output dim): +1 if the first hex digit of md5("d_j") is even. */
  def sign(d: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${d}_$j".getBytes("UTF-8"))
    // first hex digit = high nibble of byte 0
    if (((hex(0) >> 4) & 0xf) % 2 == 0) 1 else -1
  }

  /** Column of `dOut` doubles: the projection of `v` (length `dIn`). */
  def project(v: Column, dIn: Int, dOut: Int): Column = {
    require(dIn > 0 && dOut > 0, s"need positive dims, got dIn=$dIn dOut=$dOut")
    val scale = math.sqrt(dOut.toDouble)
    val comps = (0 until dOut).map { j =>
      val signs = array((1 to dIn).map(d => lit(sign(d, j).toDouble)): _*)
      (VectorFunctions.dot(VectorFunctions.toDouble(v), signs) / scale).as(s"y$j")
    }
    array(comps: _*)
  }

  /** (idCol, j, y) rows: one row per vector and output dimension. */
  def projected(
      df: DataFrame, idCol: String, vecCol: String, dIn: Int, dOut: Int): DataFrame =
    df.select(col(idCol), posexplode(project(col(vecCol), dIn, dOut)).as(Seq("j", "y")))
}
