package graft.streaming

import org.apache.spark.sql.SparkSession

/** Replay-fixture writer: materializes the `events` table as JSON files for
  * file-source streaming replay (SURVEY.md §2.11 oracle strategy — the
  * stream must converge to the batch-equivalent results Q29–Q33).
  *
  * `ts` is written as raw nanos (`ts_ns`) so the stream reader applies the
  * same micros truncation as the batch reader (Tables.events) — both paths
  * agree at microsecond precision.
  */
object StreamFixtures {

  /** Write the whole table time-ordered into `nFiles` sequential files.
    * Ordered splits mean a multi-trigger replay feeds the watermark
    * monotonically (no artificial late data); pass nFiles=1 for a
    * single-batch replay.
    */
  def writeReplayDir(spark: SparkSession, sfDir: String, outDir: String, nFiles: Int = 1): Unit = {
    // derive from the canonical loader (schema-adaptive across the NANOS /
    // NTZ / TZ testdata spellings — see Tables.events) rather than a raw
    // read: the replay contract is always ts_ns nanos, whatever the
    // parquet generation stored
    val events = graft.Tables(spark, sfDir).events
      .withColumn("ts_ns", org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000"))
      .drop("ts")
    // range-partition by time then sort within: file k holds an ordered,
    // contiguous time slice, and lexicographic file order == time order.
    events
      .repartitionByRange(nFiles, org.apache.spark.sql.functions.col("ts_ns"))
      .sortWithinPartitions("ts_ns")
      .write.mode("overwrite").json(outDir)
  }
}
