package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Mergeable sketch operators over Spark's built-in sketch library
  * (`org.apache.spark.util.sketch`) — the approximate counterparts the
  * engine's surface needs at 100 TB, where exact global answers are a
  * shuffle you can't afford on a hot path:
  *
  *  - Count-min: heavy-hitter frequency estimation. The sketch is a
  *    fixed-size counter grid built by one `treeAggregate` pass (no
  *    shuffle of the data, counters merge by addition — fully
  *    commutative, so the result is INDEPENDENT of partition layout and
  *    merge order), with the one-sided guarantee est >= exact and
  *    P[est <= exact + eps·N] >= confidence per query.
  *  - Bloom: membership prefilter. Built the same one-pass way (bitwise
  *    OR merge — also layout-independent), broadcast to the probe side
  *    to drop non-members BEFORE a shuffle join — the classic semi-join
  *    prefilter: no false negatives ever, false positives bounded by
  *    fpp and only cost a wasted probe row, never a wrong result,
  *    because the exact join behind it still decides.
  *
  * Both sketch objects are kilobyte-scale driver values regardless of
  * input size; probing re-distributes them via broadcast.
  */
object Sketches {

  /** Count-min sketch over a string column. */
  def countMin(df: DataFrame, c: Column, eps: Double, confidence: Double,
      seed: Int = 42): CountMinSketch =
    df.select(c.as("__k")).stat.countMinSketch("__k", eps, confidence, seed)

  /** (key, est) estimates for every key of `keys`' column `keyCol` —
    * probe-side broadcast, row-local estimation.
    */
  def estimateAll(keys: DataFrame, keyCol: String, cms: CountMinSketch): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cms)
    keys.select(col(keyCol).cast("string").as("k")).as[String]
      .mapPartitions { it => val s = bc.value; it.map(k => (k, s.estimateCount(k))) }
      .toDF(keyCol, "est")
  }

  /** Bloom filter over a long column. */
  def bloom(df: DataFrame, c: Column, expected: Long, fpp: Double): BloomFilter =
    df.select(c.as("__k")).stat.bloomFilter("__k", expected, fpp)

  /** Adds a boolean `might_contain` column to `probes` for long column
    * `keyCol` — the broadcast prefilter shape: at scale this column
    * feeds a filter() that drops non-members before the exact join.
    */
  def mightContain(probes: DataFrame, keyCol: String, bf: BloomFilter): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(bf)
    probes.select(col(keyCol).cast("long").as("k")).as[Long]
      .mapPartitions { it => val b = bc.value; it.map(k => (k, b.mightContainLong(k))) }
      .toDF(keyCol, "might_contain")
  }
}
