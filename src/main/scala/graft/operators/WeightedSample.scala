package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement (SURVEY.md §2.12
  * L7 family): the data-mixture primitive that picks k items with
  * inclusion probability proportional to weight — upweighting curated
  * sources, downweighting boilerplate-heavy ones — reproducibly, from a
  * seed, with no RNG state.
  *
  * Algorithm: Efraimidis–Spirakis A-Res in its exponential form. Each row
  * draws u ~ Uniform(0,1] from md5(seed, id) — a pure column expression,
  * so any engine recomputes the identical draw — and gets
  * key = -ln(u) / w, an Exponential(rate=w) variate; the k SMALLEST keys
  * are the sample. P(row i beats row j) = w_i / (w_i + w_j), the classic
  * without-replacement weighted race.
  *
  * Scale posture: key assignment is row-local; selection is
  * `orderBy(key).limit(k)` which Spark plans as TakeOrderedAndProject —
  * per-partition top-k heaps then a driver-side merge of k·P candidates,
  * no global sort, no shuffle of the data. Works unchanged at any corpus
  * size for the k values mixtures use (10^0..10^6).
  */
object WeightedSample {

  /** The (0,1] uniform draw: first 8 md5 nibbles of "seed_id" as a u32,
    * shifted off zero. Both halves of the differential gate spell this
    * identically (`('0x' || substr(md5(..),1,8))::BIGINT` in DuckDB).
    */
  def uniform(seed: String, id: Column): Column =
    (conv(substring(md5(concat_ws("_", lit(seed), id.cast("string"))), 1, 8),
      16, 10).cast("double") + 1.0) / 4294967296.0

  /** Exponential race key; smaller = more likely selected. `weight` must
    * be positive (zero-weight rows would divide by zero — filter them
    * out, they can never be sampled anyway).
    */
  def key(seed: String, id: Column, weight: Column): Column =
    -log(uniform(seed, id)) / weight

  /** k-item weighted sample without replacement. Appends the race key as
    * `sample_key` (callers gate on it rounded).
    */
  def take(df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: String): DataFrame =
    df.withColumn("sample_key", key(seed, col(idCol), col(weightCol)))
      .orderBy(col("sample_key"))
      .limit(k)
}
