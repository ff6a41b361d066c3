package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-weighted domain mixing — the "static mixture weights"
  * pretraining step (the Pile, Gopher §A3, DoReMi's baseline): given a
  * per-source document count n_s, draw a fixed-size corpus whose source
  * proportions follow a FLATTENED distribution w_s ∝ n_s^0.5 instead of
  * the raw counts, so head domains stop drowning out tail domains.
  *
  * Everything boundary-sensitive is integer-exact so the result is
  * engine-portable (no float normalization whose sum order could flip a
  * floor() at the quota boundary):
  *
  *  - weight_s   = floor(sqrt(n_s))       — one deterministic double op
  *  - S          = Σ weight_s             — integer sum, order-free
  *  - quota_s    = (total · weight_s) div S            — integer floor div
  *  - remainder  = (total · weight_s) mod S            — exact
  *  - the (total − Σ quota_s) leftover seats go to the largest remainders
  *    (ties broken by source name) — the largest-remainder method, which
  *    guarantees Σ quota_s == total exactly.
  *
  * Document selection within a source is the q64 idiom: deterministic
  * md5(id) rank, take quota_s — no RNG, reproducible across runs/engines.
  *
  * Scale shape: the per-source stats frame is domain-cardinality (tens to
  * thousands of rows — metadata), so its windows are free; quotas join
  * back to the corpus via broadcast, and the only data-scale work is the
  * per-source rank — one shuffle partitioned by source (salt a mega-source
  * into rank ranges if one domain dominates a 100 TB corpus).
  */
object DomainMixture {

  /** Per-source quotas: (source, n_docs, weight, quota) with Σ quota ==
    * total. `srcCol` is the domain column; sources with n_docs == 0 cannot
    * occur (they have no rows), and weight >= 1 because n_docs >= 1.
    */
  def quotas(docs: DataFrame, srcCol: String, total: Long): DataFrame = {
    val counts = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", floor(sqrt(col("n_docs"))).cast("long"))
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy().orderBy(col("rem").desc, col("source"))
    counts
      .withColumn("s_total", sum(col("weight")).over(wAll))
      .withColumn("quota0", expr(s"($total * weight) div s_total"))
      .withColumn("rem", expr(s"($total * weight) % s_total"))
      .withColumn("extra_rank", row_number().over(wRem))
      .withColumn("n_extra", lit(total) - sum(col("quota0")).over(wAll))
      .withColumn("quota",
        (col("quota0") + when(col("extra_rank") <= col("n_extra"), 1L).otherwise(0L))
          .cast("long"))
      .select(col("source"), col("n_docs"), col("weight"), col("quota"))
  }

  /** The mixed sample: all columns of `docs` for the quota_s md5-rank-first
    * documents of each source, plus (n_docs, weight, quota) carried through
    * for downstream accounting.
    */
  def sample(docs: DataFrame, idCol: String, srcCol: String, total: Long): DataFrame = {
    // the quota frame's key is renamed so the equi-join stays unambiguous
    // when srcCol is itself named "source"
    val q = quotas(docs, srcCol, total).withColumnRenamed("source", "__mix_src")
    val wRank = Window.partitionBy(col(srcCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs
      .withColumn("__rn", row_number().over(wRank))
      .join(broadcast(q), col(srcCol) === col("__mix_src"))
      .filter(col("__rn") <= col("quota"))
      .drop("__rn", "__mix_src")
  }
}
