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

  /** Adds `tokens_before` (exclusive prefix sum of `weightCol` in
    * `idCol` order) and `chunk_id` (= tokens_before DIV capacity) to
    * `df`. `idCol` must be unique — it defines the packing order.
    */
  def withChunkIds(
      df: DataFrame, idCol: String, weightCol: Column, capacity: Long,
      numParts: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val parted = df.withColumn("__w", weightCol.cast("long"))
      .repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id())
    // partition-local inclusive cumsum; cached because the totals pass
    // and the final projection both read it (cache-release contract:
    // see Dedup.jaccardPairs)
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    val local = parted.withColumn("__cum", sum(col("__w")).over(w)).cache()
    // the one collect: per-partition totals, <= numParts rows
    val totals = local.groupBy(col("__pid")).agg(max(col("__cum")).as("__tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = {
      var acc = 0L
      totals.map { case (pid, tot) => val o = (pid, acc); acc += tot; o }
    }
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    local.join(broadcast(offDf), Seq("__pid"))
      .withColumn("tokens_before", col("__off") + col("__cum") - col("__w"))
      .withColumn("chunk_id", expr(s"tokens_before DIV ${capacity}L"))
      .drop("__w", "__pid", "__cum", "__off")
  }
}
