package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

/** Streaming equivalence (SURVEY.md §2.11, §5.2.4): each Structured
  * Streaming operator replayed from the events fixture must converge to the
  * corresponding batch result once the source drains; plus a late-data test
  * (T9) asserting rows older than the watermark are dropped.
  */
class StreamingSpec extends SparkSpec {

  private lazy val replayDir: String = {
    val dir = Files.createTempDirectory("events_replay").toString
    StreamFixtures.writeReplayDir(spark, sfDir, dir, nFiles = 1)
    dir
  }

  private def replay = EventStreams.readReplay(spark, replayDir, filesPerTrigger = 4)

  private lazy val batchEvents = tables.events

  test("T-extra: foreachBatch upsert maintains latest-event-per-user across batches") {
    // separate replay with several files + filesPerTrigger=1 so the merge
    // actually runs incrementally (first batch creates, later ones merge)
    val inDir = Files.createTempDirectory("events_upsert_in").toString
    StreamFixtures.writeReplayDir(spark, sfDir, inDir, nFiles = 3)
    val events = EventStreams.readReplay(spark, inDir, filesPerTrigger = 1)
    val tableDir = Files.createTempDirectory("events_upsert").toString + "/latest"
    val ckpt = Files.createTempDirectory("events_upsert_ckpt").toString
    val q = EventStreams.upsertLatestPerUser(events, tableDir, ckpt)
    q.processAllAvailable(); q.stop()
    val result = spark.read.parquet(tableDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val expected = batchEvents
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    assert(result.count() == expected.count())
    assert(result.exceptAll(expected).count() == 0 && expected.exceptAll(result).count() == 0)
  }

  test("T-extra: upsert sink recovers a swap interrupted between rename-aside and move") {
    import spark.implicits._
    val tableDir = Files.createTempDirectory("events_upsert_crash").toString + "/latest"
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
    val b1 = Seq((1L, ts0, 10L, "click", 1.0), (2L, ts0, 11L, "view", 2.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val b2 = Seq((2L, ts1, 12L, "click", 3.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    EventStreams.mergeLatestBatch(b1, tableDir)
    // simulate a crash in the swap window: the table was renamed aside but
    // staging never moved in — the state the old delete-then-move order
    // turned into permanent loss of every previously merged user
    java.nio.file.Files.move(
      java.nio.file.Paths.get(tableDir), java.nio.file.Paths.get(tableDir + ".old"))
    EventStreams.mergeLatestBatch(b2, tableDir)
    val out = spark.read.parquet(tableDir)
      .select(col("user_id"), col("event_id")).as[(Long, Long)].collect().toMap
    // user 1 comes from the recovered batch-1 table, user 2 from the merge
    assert(out == Map(1L -> 10L, 2L -> 12L))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tableDir + ".old")))
  }

  test("T2 tumbling window converges to the batch aggregation") {
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.tumbling(replay), "t2_tumbling", OutputMode.Complete())
      .select(col("w_start").cast("long"), col("event_type"), col("n"),
        col("sum_value").cast("string"))
      .collect().toSet
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_value"))
      .select(col("window.start").cast("long"), col("event_type"), col("n"),
        col("sum_value").cast("string"))
      .collect().toSet
    assert(streamed == batch)
  }

  test("T3 sliding windows converge to the batch sliding aggregation") {
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.sliding(replay), "t3_sliding", OutputMode.Complete())
      .select(col("w_start").cast("long"), col("event_type"), col("n"))
      .collect().toSet
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long"), col("event_type"), col("n"))
      .collect().toSet
    assert(streamed == batch)
  }

  test("T4 session windows match the batch gaps-and-islands session counts") {
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.sessions(replay), "t4_sessions", OutputMode.Complete())
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // batch oracle: q31-style session split at >30 min gaps
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = batchEvents
      .withColumn("new_session",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L, 1)
          .otherwise(0))
      .groupBy(col("user_id")).agg(sum(col("new_session")).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("T5 stateful dedup leaves exactly the distinct event_ids") {
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.dedup(replay), "t5_dedup", OutputMode.Append())
    val nDistinct = batchEvents.select(countDistinct(col("event_id"))).head().getLong(0)
    assert(streamed.count() == nDistinct)
  }

  test("T6 mapGroupsWithState running profiles converge to batch per-user totals") {
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.userProfiles(spark, replay), "t6_profiles", OutputMode.Update())
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("total_value")).as("tot"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap
    val batch = batchEvents
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("tot"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap
    assert(streamed == batch)
  }

  test("T6b transformWithState profiles match mapGroupsWithState and batch totals") {
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventStreams.runToMemory(
        spark, EventStreams.userProfilesTws(spark, replay), "t6b_profiles", OutputMode.Update())
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n"), max(col("total_value")).as("tot"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap
      val batch = batchEvents
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("tot"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap
      assert(streamed == batch)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("T7 stream-static join matches the batch join counts") {
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.enrich(replay, tables.customer), "t7_enrich", OutputMode.Append())
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = batchEvents.join(tables.customer, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("T8 stream-stream self-join matches the batch interval join count") {
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.selfJoinWithin10Min(replay), "t8_selfjoin", OutputMode.Append())
      .count()
    val e = batchEvents
    val a = e.select(col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = e.select(col("user_id").as("b_user"), col("ts").as("b_ts"))
    val batch = a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES")).count()
    assert(streamed == batch)
  }

  test("S7 parquet sink + checkpoint: restart resumes without reprocessing") {
    val srcDir = Files.createTempDirectory("s7_src").toFile
    val outDir = Files.createTempDirectory("s7_out").toString
    val ckpt = Files.createTempDirectory("s7_ckpt").toString
    val base = 1700000000000000000L
    def writeBatch(name: String, ids: Range): Unit = {
      val rows = ids.map { i =>
        s"""{"event_id":$i,"ts_ns":${base + i * 1000000000L},"user_id":1,"event_type":"view","value":1.0,"props":"{}"}"""
      }
      Files.write(new java.io.File(srcDir, name).toPath, rows.mkString("\n").getBytes)
    }
    def start() = EventStreams.readReplay(spark, srcDir.toString, filesPerTrigger = 10)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    writeBatch("a.json", 0 until 50)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    writeBatch("b.json", 50 until 80)
    val q2 = start(); q2.processAllAvailable(); q2.stop() // resumes from checkpoint
    val out = spark.read.parquet(outDir)
    assert(out.count() == 80, "restart must process only the new file, no duplicates")
    assert(out.select(countDistinct(col("event_id"))).head().getLong(0) == 80)
  }

  test("T9 rows older than the watermark are dropped from aggregations") {
    // batch 1: a tight cluster that advances the watermark; batch 2 (written
    // only after batch 1 fully commits): one event far in the past -> must
    // be excluded. Update mode: watermark-based late-row dropping applies
    // (Complete mode deliberately retains all state and keeps late rows).
    val dir = Files.createTempDirectory("late_replay").toFile
    val base = 1700000000000000000L // ns
    val q = EventStreams
      .tumbling(EventStreams.readReplay(spark, dir.toString, filesPerTrigger = 1))
      .writeStream.format("memory").queryName("t9_late")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", Files.createTempDirectory("ckpt_t9").toString)
      .start()
    val rows1 = (0 until 10).map { i =>
      s"""{"event_id":$i,"ts_ns":${base + i * 60000000000L},"user_id":1,"event_type":"view","value":1.0,"props":"{}"}"""
    }
    Files.write(new java.io.File(dir, "a.json").toPath, rows1.mkString("\n").getBytes)
    q.processAllAvailable() // batch 1 commits; watermark = max(ts) - 10min
    val late = s"""{"event_id":99,"ts_ns":${base - 86400L * 1000000000L},"user_id":1,"event_type":"view","value":1.0,"props":"{}"}"""
    Files.write(new java.io.File(dir, "b.json").toPath, late.getBytes)
    q.processAllAvailable() // batch 2: the late row is below the watermark
    q.stop()
    // memory sink collects one row per updated window per trigger: take the
    // final count per window, then total.
    val total = spark.table("t9_late").groupBy(col("w_start"), col("event_type"))
      .agg(max(col("n")).as("n")).agg(sum(col("n"))).head().getLong(0)
    assert(total == 10, s"late event must be dropped, saw $total")
  }
}
