package graft.streaming

import graft.operators.{Dedup, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Online near-duplicate filtering over a document stream — the shape a
  * 100 TB training-data pipeline actually runs: new data is deduped
  * against an INDEX of everything already retained, never by
  * re-scanning the historical corpus. Per micro-batch:
  *
  *  1. MinHash signatures for the batch docs (the same fused
  *     aggregator the batch path uses);
  *  2. banded candidate join of batch signatures against the persisted
  *     signature index AND against the batch itself (earlier-id docs),
  *     both derived through MinHashLSH.bandKeys so the banding can
  *     never drift from the batch operators, and both bounded by the
  *     same hot-bucket discipline (within-batch pairs via
  *     cappedBucketPairs; index buckets truncated to the cap);
  *  3. similarity estimated from the signatures alone — the fraction
  *     of agreeing MinHash components is an unbiased estimator of
  *     Jaccard (Broder 1997) — so the index stores 128 longs per doc,
  *     never the original text or shingles;
  *  4. greedy resolution in doc_id order over ONLY the docs involved in
  *     a candidate pair or index hit (metadata-scale: they are the
  *     near-dups themselves, not the corpus); everything else is
  *     retained by an anti-join against the small dropped set.
  *
  * PRECONDITION for cross-run agreement: doc ids must arrive
  * monotonically non-decreasing across batches (ingest-time-assigned
  * ids, file order, etc.). Under that contract, replaying the same
  * corpus in one batch or many yields identical survivors (asserted in
  * spec). With out-of-order ids the stream still dedups correctly
  * against what it has RETAINED so far, but a later full-corpus batch
  * replay may keep a different (lower-id) member of each dup group.
  *
  * Estimator note: with 128 permutations the estimate's std-dev is
  * ~0.04 at J=0.7, so this trades exactness at the threshold boundary
  * for an index 1000x smaller than the corpus — the standard online
  * dedup contract. The batch operators (Dedup.jaccardPairs) remain the
  * exact forms.
  */
object DedupStreams {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val Bands = 32
  private val RowsPerBand = 4
  private val NumPerms = Bands * RowsPerBand

  /** Start the checkpointed streaming ingest: retained docs land in
    * `outDir` (parquet), their signatures in `indexDir`.
    */
  def ingest(
      docs: DataFrame,
      outDir: String,
      indexDir: String,
      checkpointDir: String,
      threshold: Double = 0.7,
      availableNow: Boolean = true): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        dedupBatch(batch.toDF(), outDir, indexDir, threshold, id)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Single-batch reference form: the whole frame deduped as ONE batch.
    * Under the monotone-id contract this is the expected survivor set of
    * any chunked stream drain over the same corpus — the batching-
    * invariance oracle the q111 gate compares the real streamed run
    * against.
    */
  def dedupOnce(
      docs: DataFrame, outDir: String, indexDir: String,
      threshold: Double = 0.7): Unit =
    dedupBatch(docs, outDir, indexDir, threshold, 0L)

  /** One micro-batch of the online dedup; package-private so the
    * batching-invariance and replay-idempotence properties are testable
    * directly.
    *
    * Exactly-once: survivors and signatures land in per-batch partition
    * directories (`batch=<id>`) written with overwrite — foreachBatch
    * replays a failed batch with the SAME id, so a crash between the two
    * writes (or mid-write) is healed by the rerun overwriting its own
    * partition instead of appending duplicates.
    */
  private[streaming] def dedupBatch(
      batch: DataFrame, outDir: String, indexDir: String, threshold: Double,
      batchId: Long = 0L,
      bucketCap: Int = MinHashLSH.DefaultBucketCap): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    val sigs = MinHashLSH
      .signatures(Dedup.charShingles(batch, "doc_id", "text"), NumPerms)
      .cache()
    try {
      // prior-batch partitions via the Hadoop FileSystem API — java.nio
      // would silently see nothing on hdfs:///s3a:// paths and disable
      // cross-batch dedup without an error. The CURRENT batch id is
      // excluded: an interrupted write of this id is about to be
      // overwritten and must not feed its own dedup pass. Non-numeric
      // strays are ignored rather than fatal.
      val hPath = new org.apache.hadoop.fs.Path(indexDir)
      val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
      val priorBatches =
        if (fs.exists(hPath))
          fs.listStatus(hPath).toSeq.map(_.getPath.getName)
            .filter(_.startsWith("batch="))
            .filter(n => scala.util.Try(n.stripPrefix("batch=").toLong)
              .toOption.exists(_ != batchId))
        else Seq.empty
      val index = if (priorBatches.nonEmpty)
        spark.read.parquet(priorBatches.map(b => s"$indexDir/$b"): _*)
          .select(col("doc_id"), col("sig"))
      else Seq.empty[(Long, Array[Long])].toDF("doc_id", "sig")

      // signature-estimated Jaccard: fraction of agreeing components
      def est(sa: Column, sb: Column): Column =
        aggregate(
          zip_with(sa, sb, (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, m) => acc + m).cast("double") / lit(NumPerms)

      val newBanded = MinHashLSH.bandKeys(sigs, Bands, RowsPerBand)
      // index side truncated to `bucketCap` docs per (band, key): a new
      // doc in a hot bucket is checked against the cap lowest-id index
      // members instead of all K — the streaming analog of the batch
      // star-cap (recall inside a hot bucket degrades, cost stays
      // bounded); min-id-first keeps the truncation deterministic
      val wBucket = Window.partitionBy(col("band"), col("bkey")).orderBy(col("doc_id"))
      val oldBanded = MinHashLSH.bandKeys(index, Bands, RowsPerBand)
        .withColumn("__rn", row_number().over(wBucket))
        .filter(col("__rn") <= bucketCap)
        .drop("__rn")
      // batch vs index: any estimated hit drops the new doc (every index
      // doc is by construction retained); output is the hit ids — the
      // actual near-dups, metadata-scale
      val indexHits = newBanded.alias("n")
        .join(oldBanded.alias("o"), Seq("band", "bkey"))
        .select(col("n.doc_id").as("id"), col("n.sig").as("sa"), col("o.sig").as("sb"))
        .filter(est(col("sa"), col("sb")) >= threshold)
        .select(col("id")).distinct()
        .as[Long].collect().toSet

      // batch vs earlier batch docs (da < db): candidate pairs through the
      // SAME hot-bucket cap as the batch operators (a batch of K
      // boilerplate-identical docs must produce K-1 star pairs, not K^2),
      // refined by the signature estimate
      val candidates = MinHashLSH.cappedBucketPairs(
        newBanded.select(col("doc_id"), col("band"), col("bkey")),
        bucketCap, logOverflow = false, dedup = false)
      val sa = sigs.select(col("doc_id").as("da"), col("sig").as("sa"))
      val sb = sigs.select(col("doc_id").as("db"), col("sig").as("sb"))
      val withinPairs = candidates
        .join(sa, Seq("da")).join(sb, Seq("db"))
        .filter(est(col("sa"), col("sb")) >= threshold)
        .select(col("da"), col("db")).distinct()
        .as[(Long, Long)].collect()

      // greedy resolution in id order over only the pair-involved ids —
      // a doc in no pair and no index hit is retained unconditionally,
      // and every potential dropper of a pair endpoint is itself a pair
      // endpoint, so resolving the candidate set alone is complete
      val nearOf = withinPairs.groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).toSet }
      val contested = (indexHits ++ withinPairs.flatMap(p => Seq(p._1, p._2))).toSeq.sorted
      val dropped = scala.collection.mutable.HashSet.empty[Long]
      contested.foreach { id =>
        val dupOfRetained = indexHits.contains(id) ||
          nearOf.getOrElse(id, Set.empty).exists(a => !dropped.contains(a))
        if (dupOfRetained) dropped += id
      }
      if (dropped.nonEmpty)
        log.info(s"dedupBatch($batchId): dropped ${dropped.size} near-duplicate doc(s)")

      // anti-join against the (small) dropped set; per-batch overwrite
      // partitions make a foreachBatch replay idempotent
      val droppedDf = broadcast(dropped.toSeq.toDF("doc_id"))
      batch.join(droppedDf, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      sigs.join(droppedDf, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    } finally sigs.unpersist()
    ()
  }
}
