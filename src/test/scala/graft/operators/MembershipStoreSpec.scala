package graft.operators

import graft.SparkSpec
import graft.streaming.DedupStreams
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The external-KV probe seam: both store impls must be pure WORK
  * substitutions — identical bucket-member sets, signature maps, flag
  * sets and stream survivors as the frame-join / fused inline paths,
  * with the in-memory store's coverage protocol (seed / write-through /
  * fold-resync / out-of-band rebuild) proven rather than documented.
  */
class MembershipStoreSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_store_$tag").toString

  /** Same q124-shaped corpus/batch scenario as SignatureIndexSpec. */
  private def scenario() = {
    val a = tables.documents.select($"doc_id", $"text")
    val cohort = when($"doc_id" % 9 === 3, lit("exact"))
      .when($"doc_id" % 7 === 2, lit("near"))
      .when($"doc_id" % 13 === 5, lit("novel"))
    val b = a.withColumn("cohort", cohort).filter($"cohort".isNotNull)
      .select(($"doc_id" + 2000000L).as("doc_id"),
        when($"cohort" === "exact", $"text")
          .when($"cohort" === "near", concat($"text", lit(" edited")))
          .otherwise(concat(lit("fresh item "), $"doc_id".cast("string"),
            lit(" unseen content"))).as("text"))
    (a, b)
  }

  test("parquet and in-memory stores agree with the members frame lookup-for-lookup") {
    val (corpus, _) = scenario()
    val dir = tmpDir("agree")
    SignatureIndex.build(corpus, "doc_id", "text", dir)
    // probe keys: every bucket of a slice of the corpus itself (hits
    // guaranteed) plus some absent keys
    val keys = SignatureIndex.members(spark, dir)
      .filter($"doc_id" % 5 === 0)
      .select($"band", $"bkey").distinct()
      .as[(Int, Long)].collect() ++ Array((0, 12345L), (31, -7L))
    val frame = SignatureIndex.members(spark, dir)
      .select($"band", $"bkey", $"doc_id")
      .as[(Int, Long, Long)].collect()
      .groupBy(t => (t._1, t._2))
      .map { case (k, vs) => k -> vs.map(_._3).distinct.sorted.toSeq }
    val keySet = keys.toSet
    val want = frame.filter(t => keySet.contains(t._1))
    val pq = new ParquetMembershipStore(spark, dir)
      .bucketMembers(keys).map { case (k, v) => k -> v.toSeq }
    val im = new InMemoryMembershipStore
    im.ensureCovers(spark, dir,
      SignatureIndex.componentNames(spark, dir, "members").toSet)
    val mm = im.bucketMembers(keys).map { case (k, v) => k -> v.toSeq }
    assert(pq == want, s"parquet store diverged (${pq.size} vs ${want.size} buckets)")
    assert(mm == want, s"in-memory store diverged (${mm.size} vs ${want.size} buckets)")
    // signatures: same ids, same packed bytes
    val ids = want.valuesIterator.flatten.toArray.distinct
    val sp = new ParquetMembershipStore(spark, dir).memberSigs(ids)
    val sm = im.memberSigs(ids)
    assert(sp.keySet == ids.toSet && sm.keySet == ids.toSet)
    assert(ids.forall(id => java.util.Arrays.equals(sp(id), sm(id))))
  }

  test("probeNearDuplicateIds flags identically through no store / parquet store / in-memory store") {
    val (corpus, batch) = scenario()
    val dir = tmpDir("probe")
    SignatureIndex.build(corpus, "doc_id", "text", dir)
    def flags(store: Option[MembershipStore]): Set[Long] = SignatureIndex
      .probeNearDuplicateIds(spark, dir, corpus, batch, "doc_id", "text", 0.7,
        store = store)
      .as[Long].collect().toSet
    val none = flags(None)
    assert(none.nonEmpty, "scenario must flag at least one batch doc")
    assert(flags(Some(new ParquetMembershipStore(spark, dir))) == none)
    assert(flags(Some(new InMemoryMembershipStore)) == none)
  }

  private def streamCorpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again today",
    2L -> "completely different content about spark physical plans and shuffles",
    3L -> "the quick brown fox jumps over the lazy dog again and again today",
    4L -> "third unrelated document mentioning parquet statistics and pruning",
    5L -> "the quick brown fox jumps over the lazy dog again and again yesterday",
    6L -> "completely different content about spark physical plans and shuffles",
    7L -> "ab"
  ).toDF("doc_id", "text")

  private def drain(
      store: Option[MembershipStore], slices: Seq[Seq[Long]],
      compactEvery: Int = 0): (Set[Long], String) = {
    val root = Files.createTempDirectory("graft_store_drain").toString
    val out = s"$root/out"; val idx = s"$root/index"
    slices.zipWithIndex.foreach { case (ids, i) =>
      DedupStreams.dedupBatch(
        streamCorpus.filter(col("doc_id").isin(ids: _*)), out, idx,
        threshold = 0.7, batchId = i, compactEvery = compactEvery, store = store)
    }
    (spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSet, idx)
  }

  test("store-backed stream drain retains exactly the no-store survivors, and writes the identical index") {
    val slices = Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L, 7L))
    val (noStore, idxA) = drain(None, slices)
    val (kv, idxB) = drain(Some(new InMemoryMembershipStore), slices)
    assert(noStore == Set(1L, 2L, 4L, 7L))
    assert(kv == noStore)
    def indexRows(idx: String) = SignatureIndex.members(spark, idx)
      .select($"band", $"bkey", $"doc_id").as[(Int, Long, Long)].collect().toSet
    assert(indexRows(idxB) == indexRows(idxA),
      "the KV-probed run must write the same durable membership rows")
  }

  test("store-backed drain survivors are independent of batching") {
    val one = drain(Some(new InMemoryMembershipStore), Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)))._1
    val perDoc = drain(Some(new InMemoryMembershipStore), (1L to 7L).map(Seq(_)))._1
    assert(one == perDoc)
  }

  test("in-memory store survives its own folds via resync and absorbs out-of-band appends via seeding") {
    val st = new InMemoryMembershipStore
    val root = Files.createTempDirectory("graft_store_fold").toString
    val out = s"$root/out"; val idx = s"$root/index"
    // 6 single-doc batches with compactEvery=2: folds at batches 2 and 4
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    ids.zipWithIndex.foreach { case (id, i) =>
      DedupStreams.dedupBatch(
        streamCorpus.filter(col("doc_id") === id), out, idx,
        threshold = 0.7, batchId = i, compactEvery = 2, store = Some(st))
    }
    val survivors = spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 4L), s"got $survivors")
    // post-fold coverage names must match the live listing exactly
    val live = SignatureIndex.componentNames(spark, idx, "members").toSet
    assert(st.knownPaths == live, s"known=${st.knownPaths} live=$live")
    // out-of-band append (a batch writer this store never saw): next
    // ensureCovers seeds it and the new doc's copies get flagged
    SignatureIndex.append(
      Seq(100L -> "an entirely new retained document about columnar encodings")
        .toDF("doc_id", "text"),
      "doc_id", "text", idx, batchId = 50L,
      cfg = SignatureIndex.Config(3, 128, 32, 4))
    DedupStreams.dedupBatch(
      Seq(101L -> "an entirely new retained document about columnar encodings")
        .toDF("doc_id", "text"),
      out, idx, threshold = 0.7, batchId = 51L, compactEvery = 0, store = Some(st))
    val after = spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSet
    assert(!after.contains(101L),
      "copy of the out-of-band appended doc must be dropped (store seeded the append)")
  }

  test("parquet store past 1024 distinct keys: every scan branch stays filtered (no full-index collect), results unchanged") {
    val (corpus, _) = scenario()
    val dir = tmpDir("chunk")
    SignatureIndex.build(corpus, "doc_id", "text", dir)
    // real keys (hits guaranteed) padded with synthetic absent keys to
    // push the probe well past the 1024-literal per-scan bound — the r9
    // fallback dropped the filter entirely here and collected the whole
    // index to the driver
    val realKeys = SignatureIndex.members(spark, dir)
      .select($"band", $"bkey").distinct().as[(Int, Long)].collect()
    val keys = realKeys ++ (0 until 3000).map(i => (i % 32, 900000000L + i))
    val nKeys = keys.map(_._2).distinct.length
    assert(nKeys > 2048, s"scenario must exceed two chunks, got $nKeys keys")
    val pq = new ParquetMembershipStore(spark, dir)
    // plan shape: the probe is a union of per-chunk scans, EVERY leaf
    // under a Filter carrying the chunk's In predicate — an unfiltered
    // leaf is exactly the banned full-scan-collect
    val memberPaths = SignatureIndex.tablePaths(spark, dir, "members", None)
    val probe = pq.prunedScan(
      spark.read.parquet(memberPaths: _*), "bkey", keys.map(_._2).distinct)
    import org.apache.spark.sql.catalyst.plans.logical
    def leaves(p: logical.LogicalPlan, filtered: Boolean): Seq[Boolean] = p match {
      case f: logical.Filter =>
        val hasKey = f.condition.references.exists(_.name == "bkey")
        f.children.flatMap(leaves(_, filtered || hasKey))
      case l if l.children.isEmpty => Seq(filtered)
      case _ => p.children.flatMap(leaves(_, filtered))
    }
    val marks = leaves(probe.queryExecution.optimizedPlan, filtered = false)
    val expectChunks = (nKeys + 1023) / 1024
    assert(marks.length == expectChunks,
      s"expected $expectChunks chunked scan branches, got ${marks.length}")
    assert(marks.forall(identity), "an unfiltered scan branch survived past the literal cap")
    // results: identical to the frame-derived expectation at this key count
    val keySet = keys.toSet
    val want = SignatureIndex.members(spark, dir)
      .select($"band", $"bkey", $"doc_id").as[(Int, Long, Long)].collect()
      .groupBy(t => (t._1, t._2))
      .map { case (k, vs) => k -> vs.map(_._3).distinct.sorted.toSeq }
      .filter(t => keySet.contains(t._1))
    val got = pq.bucketMembers(keys).map { case (k, v) => k -> v.toSeq }
    assert(got == want, s"chunked probe diverged (${got.size} vs ${want.size} buckets)")
    // signatures through the same chunked path
    val ids = want.valuesIterator.flatten.toArray.distinct ++
      (0 until 2000).map(i => 800000000L + i)
    assert(ids.distinct.length > 1024)
    val sigs = pq.memberSigs(ids)
    assert(sigs.keySet == want.valuesIterator.flatten.toSet)
  }

  test("in-memory store coverage violation (uncertified fold) forces a full rebuild, not a silent miss") {
    val st = new InMemoryMembershipStore
    val root = Files.createTempDirectory("graft_store_oob").toString
    val out = s"$root/out"; val idx = s"$root/index"
    DedupStreams.dedupBatch(
      streamCorpus.filter(col("doc_id") <= 2), out, idx,
      threshold = 0.7, batchId = 0, compactEvery = 0, store = Some(st))
    // an out-of-band MAJOR fold renames everything under names the
    // store never certified
    SignatureIndex.compact(spark, idx, upTo = 0L)
    DedupStreams.dedupBatch(
      streamCorpus.filter(col("doc_id") === 3), out, idx,
      threshold = 0.7, batchId = 1, compactEvery = 0, store = Some(st))
    val after = spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSet
    assert(after == Set(1L, 2L), s"doc 3 (copy of 1) must still be dropped: $after")
  }
}
