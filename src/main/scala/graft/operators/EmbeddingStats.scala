package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension robust statistics over an embedding column (L3
  * support surface): exact quartiles + IQR-fence outlier counts, the
  * audit a feature-scaling / whitening stage runs before ANN indexing.
  *
  * Why not `percentile()` per dim: an exact percentile AGGREGATE must
  * materialize every value of a group in one task's memory, and
  * grouping by dimension yields exactly d groups — at 10^9 vectors
  * that is 10^9 doubles through each of d hot reducers (the
  * PARTITION-BY-few-groups trap). Here the k-th order statistics come
  * from DISTRIBUTED SELECTION instead: range-partitioned global ranks
  * per dim via [[SequencePacking.keyedPrefixSum]], then only the ≤ 2
  * boundary rows per (dim, quantile) are touched — every stage is a
  * scan, a range shuffle, or a metadata-scale aggregate; no task ever
  * holds a dimension's values.
  *
  * Interpolation is pinned to the quantile_cont convention
  * `v_lo·(1−frac) + v_hi·frac` with `frac = q·(n−1) − floor(q·(n−1))`
  * (verified bit-for-bit against DuckDB on adversarial doubles), so
  * exact cross-engine hash gating works on DOUBLE outputs.
  */
object EmbeddingStats {

  /** (dim, n, p25, p50, p75, n_outliers) per vector dimension, ordered
    * by dim; n_outliers counts values outside [p25 − 1.5·IQR,
    * p75 + 1.5·IQR]. `idCol` must be unique per row — it breaks rank
    * ties deterministically.
    */
  def dimRobustStats(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vals = emb
      .select(col(idCol).as("vid"), posexplode(col(vecCol)))
      .select(col("pos").cast("long").as("dim"), col("col").cast("double").as("v"),
        col("vid"))
    val ranked = SequencePacking.keyedPrefixSum(
      vals, Seq("dim"), Seq(col("v"), col("vid")), lit(1L), "rk")
    // one row per dim — rides the cached rank frame, then broadcasts back
    val ns = ranked.groupBy(col("dim")).agg((max(col("rk")) + 1L).as("n"))
    val withN = ranked.join(broadcast(ns), "dim")

    def loOf(q: Double) = floor(lit(q) * (col("n") - 1L).cast("double"))
    def interp(q: Double) = {
      val pos = lit(q) * (col("n") - 1L).cast("double")
      val lo = loOf(q)
      val frac = pos - lo
      sum(when(col("rk") === lo.cast("long"), col("v") * (lit(1.0) - frac))
        .when(col("rk") === lo.cast("long") + 1L, col("v") * frac)
        .otherwise(lit(0.0)))
    }
    val needed = Seq(0.25, 0.5, 0.75)
      .map(q => col("rk") === loOf(q).cast("long") ||
        col("rk") === loOf(q).cast("long") + 1L)
      .reduce(_ || _)
    val qs = withN
      .filter(needed) // ≤ 6 rows per dim reach the aggregate
      .groupBy(col("dim"), col("n"))
      .agg(interp(0.25).as("p25"), interp(0.5).as("p50"), interp(0.75).as("p75"))

    val fences = qs.select(col("dim"),
      (col("p25") - lit(1.5) * (col("p75") - col("p25"))).as("f_lo"),
      (col("p75") + lit(1.5) * (col("p75") - col("p25"))).as("f_hi"))
    val outs = vals.join(broadcast(fences), "dim")
      .groupBy(col("dim"))
      .agg(sum(when(col("v") < col("f_lo") || col("v") > col("f_hi"), 1L)
        .otherwise(0L)).as("n_outliers"))
    qs.join(outs, "dim")
      .select(col("dim"), col("n"), col("p25"), col("p50"), col("p75"),
        col("n_outliers"))
      .orderBy(col("dim"))
  }
}
