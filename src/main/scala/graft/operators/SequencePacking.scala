package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing — the "sample packing" step of an LLM
  * training-data pipeline: documents are concatenated in a
  * deterministic order and the token stream is cut into fixed-capacity
  * context windows; a document lands in chunk
  * `floor(tokens_before / capacity)` where `tokens_before` is the
  * exclusive prefix sum of token counts in id order.
  *
  * The textbook formulation is a global window (`ORDER BY id` with no
  * PARTITION BY) — Spark executes that as ONE task holding the whole
  * corpus, a non-starter at 100 TB. This operator computes the same
  * prefix sum distributed: range-repartition on the id (total order
  * across partitions), partition-local cumulative sums via an ordinary
  * partitioned window, then shift each partition by the sum of the
  * totals before it. The per-partition totals are the only driver
  * materialization — numPartitions rows, metadata-scale — broadcast
  * back as a join against the partition id. The result is independent
  * of the partition layout (the prefix sum is defined by the total
  * order, not the split points), so the same call verifies against a
  * single-window oracle and scales to a cluster unchanged.
  */
object SequencePacking {

  /** Adds `outCol` = the EXCLUSIVE prefix sum of `weightCol` within each
    * `keyCols` group, in `orderCols` order (keys empty → one global
    * group). This is the skew-proof spelling of
    * `sum(w) OVER (PARTITION BY keys ORDER BY ord ROWS UNBOUNDED
    * PRECEDING AND 1 PRECEDING)`: a plain partitioned window puts an
    * ENTIRE key group in one task, so a handful of buckets/sources over
    * a 100 TB corpus would serialize into a handful of tasks. Here the
    * data is range-partitioned on (keys, order) — so every key group
    * spans contiguous partitions and large groups split across MANY
    * tasks — cumsummed partition-locally, then shifted by the per-
    * (partition, key) totals. The totals frame is metadata-scale
    * (≤ numParts + #keys rows, because groups are contiguous under the
    * range partitioning), so its own offset window is trivial and is
    * broadcast back. The result depends only on the (keys, order) total
    * order, not the partition layout, so the same call verifies against
    * a single-window oracle and scales to a cluster unchanged.
    *
    * `orderCols` must be a total order within each key group (callers
    * pass a unique id as the last column). Project `df` down to the
    * columns you need FIRST: the internal cache materializes the full
    * input width, so extra columns ride the rank shuffle and the cache.
    */
  def keyedPrefixSum(
      df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
      weightCol: Column, outCol: String, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val rangeCols = keyCols.map(col) ++ orderCols
    val parted = df.withColumn("__w", weightCol.cast("long"))
      .repartitionByRange(n, rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
    // partition-local inclusive cumsum; cached because the totals pass
    // and the final projection both read it (cache-release contract:
    // see Dedup.jaccardPairs)
    val w = Window.partitionBy((col("__pid") +: keyCols.map(col)): _*)
      .orderBy(orderCols: _*)
    val local = parted.withColumn("__cum", sum(col("__w")).over(w)).cache()
    // per-(partition, key) totals: metadata-scale, so the cross-partition
    // offset is itself a trivial window over the totals frame — no
    // driver-side collect at all
    val totals = local.groupBy((col("__pid") +: keyCols.map(col)): _*)
      .agg(sum(col("__w")).as("__tot"))
    val wOff = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pid"))
    val offs = totals
      .withColumn("__off", sum(col("__tot")).over(wOff) - col("__tot"))
      .drop("__tot")
    // the using-columns join moves the join keys first; restore the
    // caller's column order (contract: input columns + outCol appended)
    local.join(broadcast(offs), "__pid" +: keyCols)
      .withColumn(outCol, col("__off") + col("__cum") - col("__w"))
      .select(df.columns.map(col) :+ col(outCol): _*)
  }

  /** Adds `tokens_before` (exclusive prefix sum of `weightCol` in
    * `idCol` order) and `chunk_id` (= tokens_before DIV capacity) to
    * `df`. `idCol` must be unique — it defines the packing order.
    */
  def withChunkIds(
      df: DataFrame, idCol: String, weightCol: Column, capacity: Long,
      numParts: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    keyedPrefixSum(df, Nil, Seq(col(idCol)), weightCol, "tokens_before", numParts)
      .withColumn("chunk_id", expr(s"tokens_before DIV ${capacity}L"))
  }
}
