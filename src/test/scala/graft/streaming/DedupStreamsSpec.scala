package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online (incremental) near-dup dedup: the streaming ingest must drop
  * copies of already-retained documents using only the signature index
  * — never the historical text — and its result must not depend on how
  * the corpus was batched.
  */
class DedupStreamsSpec extends SparkSpec {

  import spark.implicits._

  // a corpus with exact copies, a near-copy, and unrelated docs; ids
  // spread across batches so cross-batch dedup is actually exercised
  private def corpus: DataFrame = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again today",
    2L -> "completely different content about spark physical plans and shuffles",
    3L -> "the quick brown fox jumps over the lazy dog again and again today",
    4L -> "third unrelated document mentioning parquet statistics and pruning",
    5L -> "the quick brown fox jumps over the lazy dog again and again yesterday",
    6L -> "completely different content about spark physical plans and shuffles",
    7L -> "ab" // shorter than the shingle width: no signature, always retained
  ).toDF("doc_id", "text")

  private def runBatched(slices: Seq[Seq[Long]]): Set[Long] = {
    val root = Files.createTempDirectory("dedup_stream").toString
    val out = s"$root/out"; val idx = s"$root/index"
    slices.zipWithIndex.foreach { case (ids, i) =>
      DedupStreams.dedupBatch(
        corpus.filter(col("doc_id").isin(ids: _*)), out, idx, threshold = 0.7, batchId = i)
    }
    spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSet
  }

  test("copies of retained docs are dropped across batches via the signature index alone") {
    val survivors = runBatched(Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L, 7L)))
    // 3 and 6 are exact copies of retained 1 and 2; 5 is a near-copy of 1
    // (one word differs); 7 is sub-shingle-width and passes through
    assert(survivors == Set(1L, 2L, 4L, 7L))
  }

  test("bloom saturation triggers a geometric resize and pruning stays correct") {
    // production capacity floor (1<<20) is only crossed after ~100
    // thousand-doc triggers; lower it so the resize path actually runs:
    // batch 0 admits ~3 docs x 32 band rows > 64, so batch 1's fetch
    // sees items > capacity and must rebuild 4x from the tracked count
    // instead of degrading to full scans forever
    val prev = DedupStreams.MinBloomCapacity
    DedupStreams.MinBloomCapacity = 64L
    try {
      val root = Files.createTempDirectory("dedup_resize").toString
      val out = s"$root/out"; val idx = s"$root/index"
      DedupStreams.dedupBatch(
        corpus.filter(col("doc_id").isin(1L, 2L, 4L)), out, idx,
        threshold = 0.7, batchId = 0)
      val cap0 = DedupStreams.probeCapacity(idx).get
      assert(cap0 == 64L, s"initial capacity must be the lowered floor: $cap0")
      val batch1 = corpus.filter(col("doc_id").isin(3L, 6L)).unionByName(
        Seq(8L -> "a genuinely novel late arrival about broadcast joins and salting")
          .toDF("doc_id", "text"))
      DedupStreams.dedupBatch(batch1, out, idx, threshold = 0.7, batchId = 1)
      val cap1 = DedupStreams.probeCapacity(idx).get
      assert(cap1 > cap0 && cap1 >= 4 * 32,
        s"saturated state must resize geometrically: $cap0 -> $cap1")
      // pruning correctness through the resize: 3 and 6 are exact copies
      // of retained 1 and 2 (must drop); 8 is novel (must be retained —
      // resize must not over-drop)
      val kept = spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L, 8L), s"survivors wrong through resize: $kept")
    } finally DedupStreams.MinBloomCapacity = prev
  }

  test("an empty micro-batch leaves the session's parquet pushdown conf untouched") {
    // dedupBatch raises spark.sql.parquet.pushdown.inFilterThreshold for
    // the probe's In-filters and must restore it on EVERY exit path; the
    // empty-batch early return is the one that doesn't reach the probe
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    val before = spark.conf.getOption(key)
    val root = Files.createTempDirectory("dedup_empty").toString
    DedupStreams.dedupBatch(
      corpus.filter(col("doc_id") < 0), s"$root/out", s"$root/index",
      threshold = 0.7, batchId = 0)
    assert(spark.conf.getOption(key) == before,
      s"conf leak: $key = ${spark.conf.getOption(key)}, expected $before")
  }

  test("survivors are independent of batching (one batch vs three)") {
    val oneBatch = runBatched(Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)))
    val threeBatches = runBatched(Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L, 7L)))
    val perDoc = runBatched((1L to 7L).map(Seq(_)))
    assert(oneBatch == threeBatches && threeBatches == perDoc)
  }

  test("a replayed batch (same id) is idempotent - no duplicate survivors") {
    val root = Files.createTempDirectory("dedup_stream_replay").toString
    val out = s"$root/out"; val idx = s"$root/index"
    DedupStreams.dedupBatch(
      corpus.filter(col("doc_id") <= 2), out, idx, threshold = 0.7, batchId = 0)
    // simulate foreachBatch redelivery after a crash: same batch, same id
    DedupStreams.dedupBatch(
      corpus.filter(col("doc_id") <= 2), out, idx, threshold = 0.7, batchId = 0)
    val rows = spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSeq
    assert(rows.sorted == Seq(1L, 2L), s"replay must overwrite, not append: $rows")
  }

  test("streaming ingest end-to-end drains a replay directory with dedup applied") {
    val root = Files.createTempDirectory("dedup_stream_e2e").toString
    val in = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    corpus.coalesce(1).write.json(s"$in/batch0")
    val schema = corpus.schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .json(s"$in/*")
    val q = DedupStreams.ingest(stream, s"$root/out", s"$root/index", s"$root/ckpt")
    q.awaitTermination(120000)
    val survivors = spark.read.parquet(s"$root/out")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 4L, 7L))
  }

  // fully distinct docs (disjoint token sets): no near-dups, so the index
  // grows by the whole batch every trigger — the worst case for any
  // per-trigger work that scales with index size
  private def distinctDocs(ids: Seq[Long]): DataFrame =
    ids.map { i =>
      // seeded-random words: near-zero char-shingle overlap between docs
      // (structured ids like "tok<i>x<k>" share most of their 3-grams)
      val rng = new scala.util.Random(i)
      i -> Seq.fill(30)(rng.alphanumeric.take(8).mkString).mkString(" ")
    }.toDF("doc_id", "text")

  test("per-batch shuffle work is O(batch), independent of index size") {
    val root = Files.createTempDirectory("dedup_stream_obatch").toString
    val out = s"$root/out"; val idx = s"$root/index"
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffled.addAndGet(t.taskMetrics.shuffleReadMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val perBatch = (0 until 24).map { i =>
        val ids = (i * 20L) until (i * 20L + 20)
        shuffled.set(0)
        DedupStreams.dedupBatch(distinctDocs(ids), out, idx, threshold = 0.7,
          batchId = i.toLong, compactEvery = 8)
        org.apache.spark.sql.graft.ListenerBusHook.drain(spark.sparkContext)
        shuffled.get()
      }
      // the old implementation re-banded + re-windowed the FULL index per
      // trigger: its shuffle grew by ~batch*bands records every batch. The
      // incremental index shuffles only batch-derived rows, so late batches
      // must not exceed early ones beyond noise. Compaction batches (8, 16)
      // legitimately shuffle nothing extra (pure concat reads), but AQE
      // variance exists — compare medians of the two halves.
      def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
      val early = median(perBatch.slice(2, 10))
      val late = median(perBatch.slice(16, 24))
      assert(late <= early * 1.5 + 100,
        s"per-batch shuffle grew with index size: early median $early, " +
          s"late median $late (per-batch: ${perBatch.mkString(", ")})")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("compaction bounds the directory listing and preserves survivors") {
    // same corpus drained with and without compaction must agree exactly
    def drain(compactEvery: Int): (String, Set[Long]) = {
      val root = Files.createTempDirectory("dedup_stream_compact").toString
      (0 until 12).foreach { i =>
        val docs =
          if (i % 3 == 2) corpus.filter(col("doc_id") === (i % 7 + 1)) // re-sends: dups
          else distinctDocs(Seq(100L + i))
        DedupStreams.dedupBatch(docs, s"$root/out", s"$root/index", threshold = 0.7,
          batchId = i.toLong, compactEvery = compactEvery)
      }
      val survivors = spark.read.parquet(s"$root/out")
        .select(col("doc_id")).as[Long].collect().toSet
      (root, survivors)
    }
    val (rootC, survC) = drain(compactEvery = 4)
    val (_, survN) = drain(compactEvery = 0)
    assert(survC == survN, "compaction changed the survivor set")
    for (table <- Seq("members", "sigs")) {
      val names = new java.io.File(s"$rootC/index/$table").list().toSeq
      val batchDirs = names.filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
      assert(names.contains("compacted=7"),
        s"$table: expected epoch compacted=7 in $names")
      assert(batchDirs.forall(_ > 7),
        s"$table: folded batch dirs must be deleted, saw $names")
      assert(batchDirs.size <= 4, s"$table: listing not bounded: $names")
    }
  }

  test("size-tiered folds: minors write run= dirs, probe still hits them, major re-absorbs") {
    val root = Files.createTempDirectory("dedup_stream_tiered").toString
    val out = s"$root/out"; val idx = s"$root/index"
    var sawRun = false
    (0 until 40).foreach { i =>
      DedupStreams.dedupBatch(distinctDocs(Seq(i.toLong)), out, idx,
        threshold = 0.7, batchId = i.toLong, compactEvery = 2)
      sawRun ||= new java.io.File(s"$idx/members").list().exists(_.startsWith("run="))
    }
    assert(sawRun, "the geometric trigger never took the minor-fold path in 20 folds")
    // a duplicate of doc 0 (folded long ago, possibly sitting in a run=
    // dir right now) must still be dropped through the probe
    DedupStreams.dedupBatch(
      distinctDocs(Seq(0L)).select(lit(900L).as("doc_id"), col("text")),
      out, idx, threshold = 0.7, batchId = 40L, compactEvery = 2)
    val survivors = spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSet
    assert(survivors == (0L until 40L).toSet,
      s"tiered folds lost or duplicated survivors: ${survivors.size}")
    for (table <- Seq("members", "sigs")) {
      val names = new java.io.File(s"$idx/$table").list().toSeq
      assert(names.count(_.startsWith("compacted=")) == 1,
        s"$table: exactly one epoch expected: $names")
      assert(names.count(_.startsWith("run=")) <= 8, s"$table: runs unbounded: $names")
      assert(names.count(_.startsWith("batch=")) <= 3, s"$table: batches unbounded: $names")
    }
  }

  test("a replayed batch at a compaction boundary is idempotent") {
    val root = Files.createTempDirectory("dedup_stream_compact_replay").toString
    val out = s"$root/out"; val idx = s"$root/index"
    def run(i: Long): Unit = DedupStreams.dedupBatch(
      distinctDocs(Seq(i)), out, idx,
      threshold = 0.7, batchId = i, compactEvery = 4)
    (0L until 8L).foreach(run) // all distinct: every doc must survive once
    run(7L) // foreachBatch redelivery of the compaction-triggering batch
    run(4L) // and of an already-folded batch id (late duplicate delivery)
    val rows = spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSeq
    assert(rows.sorted == (0L until 8L),
      s"replay across compaction must not duplicate or lose survivors: $rows")
  }

  test("driver-resident and distributed batch kernels agree across the cap boundary") {
    def drain(dbCap: Long): (Set[Long], Map[String, Long]) = {
      val root = Files.createTempDirectory("dedup_stream_paths").toString
      Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L, 7L)).zipWithIndex.foreach { case (ids, i) =>
        DedupStreams.dedupBatch(
          corpus.filter(col("doc_id").isin(ids: _*)), s"$root/out", s"$root/index",
          threshold = 0.7, batchId = i.toLong, driverBatchCap = dbCap)
      }
      val survivors = spark.read.parquet(s"$root/out")
        .select(col("doc_id")).as[Long].collect().toSet
      val index = Map(
        "members" -> spark.read.parquet(s"$root/index/members/batch=*").count(),
        "sigs" -> spark.read.parquet(s"$root/index/sigs/batch=*").count())
      (survivors, index)
    }
    val (sDriver, iDriver) = drain(DedupStreams.DefaultDriverBatchCap)
    val (sDist, iDist) = drain(0L) // cap 0: every batch takes the distributed path
    assert(sDriver == sDist, "survivor sets diverge across the kernel cap")
    assert(iDriver == iDist, "persisted index state diverges across the kernel cap")
    assert(sDriver == Set(1L, 2L, 4L, 7L))
  }

  test("write-time bucket admission enforces the cap") {
    val root = Files.createTempDirectory("dedup_stream_cap").toString
    val out = s"$root/out"; val idx = s"$root/index"
    // threshold > 1: nothing is ever dropped, so four identical docs (same
    // signature => same 32 buckets) all survive — but only the first two
    // may enter each bucket under cap=2
    val docs = Seq(1L, 2L, 3L, 4L)
      .map(_ -> "identical text shared by every document in this batch")
      .toDF("doc_id", "text")
    DedupStreams.dedupBatch(docs, out, idx, threshold = 1.5, batchId = 0,
      bucketCap = 2)
    val members = spark.read.parquet(s"$idx/members/batch=0")
    val perBucket = members.groupBy(col("band"), col("bkey")).count()
      .select(max(col("count"))).as[Long].head()
    assert(perBucket <= 2, s"bucket admission exceeded cap: $perBucket")
    assert(members.select(col("doc_id")).distinct().as[Long].collect().toSet
      == Set(1L, 2L), "only the cap lowest-id docs may hold bucket membership")
    // a later batch against the full buckets: the new doc is admitted
    // nowhere, but all four earlier docs plus it are retained
    DedupStreams.dedupBatch(
      Seq(5L -> "identical text shared by every document in this batch")
        .toDF("doc_id", "text"),
      out, idx, threshold = 1.5, batchId = 1, bucketCap = 2)
    val mem1 = new java.io.File(s"$idx/members/batch=1")
    val admitted1 =
      if (mem1.exists()) spark.read.parquet(s"$idx/members/batch=1").count() else 0L
    assert(admitted1 == 0, s"full buckets must admit no new members: $admitted1")
    val survivors = spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("packed SWAR agreement count equals the per-component loop exactly") {
    def naive(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).count { case (x, y) => x == y }
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val n = 128
      val a = Array.fill(n)(rnd.nextInt(256).toLong)
      // mix of heavy agreement (near-dup case), none, and random
      val b = trial % 3 match {
        case 0 => a.clone()
        case 1 => a.map(v => (v + 1) & 255L)
        case _ => a.map(v => if (rnd.nextBoolean()) v else rnd.nextInt(256).toLong)
      }
      assert(DedupStreams.packedAgreeCount(
        DedupStreams.packSig8(a), DedupStreams.packSig8(b)) == naive(a, b))
    }
    // the borrow-cascade case that breaks the classic (x-LO)&~x&HI zero-
    // byte trick: a zero byte directly below a 0x01 byte (x = …0100…)
    val a = Array.fill(16)(0L)
    val b = Array.tabulate(16)(i => if (i == 1) 1L else 0L) // byte 1 differs
    assert(DedupStreams.packedAgreeCount(
      DedupStreams.packSig8(a), DedupStreams.packSig8(b)) == 15)
  }
}
