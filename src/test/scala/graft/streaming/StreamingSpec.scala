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

  test("T6c closedSessionsTws: closed ∪ live ≡ the unbounded sessionizer, exactly-once, mid-stream closure") {
    // Controlled corpus, one file per micro-batch (written only after the
    // previous batch commits, so watermark progression is deterministic):
    //   user 1: session A = [t0, t0+5m] (2 events), session B = [t0+60m,
    //           t0+62m] (2 events)   (55m gap > 30m session gap)
    //   user 2: session A = [t0+1m] (1 event), session B = [t0+120m] (1)
    //   user 99 (sentinel): [t0+240m, t0+241m] — advances the watermark so
    //           every REAL session closes, while its own stays LIVE at
    //           shutdown (watermark never reaches t0+241m+30m), pinning
    //           that live intervals are retained in state, not emitted.
    val dir = Files.createTempDirectory("bounded_sess").toFile
    val base = 1700000000000000000L // ns
    def ev(id: Int, user: Long, offsetMin: Long): String =
      s"""{"event_id":$id,"ts_ns":${base + offsetMin * 60000000000L},"user_id":$user,"event_type":"view","value":1.0,"props":"{}"}"""
    val files = Seq(
      "a.json" -> Seq(ev(1, 1, 0), ev(2, 1, 5), ev(3, 2, 1)),
      "b.json" -> Seq(ev(4, 1, 60), ev(5, 1, 62)),
      "c.json" -> Seq(ev(6, 2, 120)),
      "d.json" -> Seq(ev(7, 99, 240), ev(8, 99, 241)))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val outDir = Files.createTempDirectory("bounded_sess_out").toString + "/out"
    try {
      val stream = EventStreams.readReplay(spark, dir.toString, filesPerTrigger = 1)
      val q = EventStreams.closedSessionsTws(spark, stream)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", Files.createTempDirectory("ckpt_t6c").toString)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!b.isEmpty) b.withColumn("batch", lit(id))
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      var lastBatch = 0L
      try files.foreach { case (name, rows) =>
        Files.write(new java.io.File(dir, name).toPath, rows.mkString("\n").getBytes)
        q.processAllAvailable()
        lastBatch = q.lastProgress.batchId
      } finally q.stop()
      val closed = spark.read.parquet(outDir)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s_start_us"),
          r.getAs[Long]("s_end_us"), r.getAs[Long]("n_events"), r.getAs[Long]("batch")))
      // exactly-once: no session row is ever re-emitted
      assert(closed.map(t => (t._1, t._2)).distinct.length == closed.length,
        s"duplicate closed-session emissions: ${closed.mkString(", ")}")
      // the sentinel's session is still live at shutdown — never emitted
      assert(!closed.exists(_._1 == 99L), s"live session emitted: ${closed.mkString(", ")}")
      // closed sessions == the batch session_window answer over the real users
      val us = (m: Long) => (base / 1000L) + m * 60000000L
      val expected = Set(
        (1L, us(0), us(5), 2L), (1L, us(60), us(62), 2L),
        (2L, us(1), us(1), 1L), (2L, us(120), us(120), 1L))
      assert(closed.map(t => (t._1, t._2, t._3, t._4)).toSet == expected,
        s"closed sessions diverge: got ${closed.mkString(", ")}")
      // bounded state is useful only if sessions close BEFORE stream end:
      // user 1's session A must close once the watermark passes t0+35m,
      // i.e. strictly before the sentinel file's batch
      assert(closed.filter(_._1 == 1L).map(_._5).min < lastBatch,
        s"no mid-stream closure: ${closed.mkString(", ")} lastBatch=$lastBatch")
      // BOUNDED state, measured: at shutdown the store holds only the
      // sentinel's live session + its timer bookkeeping — every real
      // user's state rows AND timers were evicted on close. An
      // unbounded (or leaky) variant would retain rows for all three
      // users here, and for every user ever seen at scale.
      val finalStateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(finalStateRows <= 4,
        s"state not bounded by the live horizon: $finalStateRows rows at shutdown")
      // closed ∪ live ≡ unbounded: per-user summaries of the closed set
      // must match the unbounded variant's final state for the real
      // users, and the sentinel's state (live, unemitted here) must be
      // exactly the unbounded variant's answer for user 99
      val unbounded = EventStreams.runToMemory(
        spark, EventStreams.sessionSummaryTws(spark,
          EventStreams.readReplay(spark, dir.toString, filesPerTrigger = 1)),
        "t6c_unbounded", OutputMode.Update())
        .groupBy(col("user_id"))
        .agg(max(col("n_sessions")).as("ns"), max(col("n_events")).as("ne"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val closedByUser = closed.groupBy(_._1)
        .map { case (u, ss) => u -> ((ss.length.toLong, ss.map(_._4).sum)) }
      assert(closedByUser == unbounded.removed(99L),
        s"closed sessions != unbounded summaries: $closedByUser vs $unbounded")
      assert(unbounded(99L) == ((1L, 2L)), s"sentinel summary: ${unbounded(99L)}")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
