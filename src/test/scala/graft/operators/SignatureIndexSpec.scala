package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SignatureIndex: the persisted banded corpus index and its probe must
  * be a pure WORK optimization — index-backed admission ≡ the in-plan
  * recompute — and the on-disk layout must interoperate with the
  * streaming ingest in both directions (stream-built index probed by
  * batch; batch-built index seeding a stream).
  */
class SignatureIndexSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sigidx_$tag").toString

  /** q124-shaped scenario over the sf0.001 documents: corpus = documents,
    * batch = exact/near/novel cohorts at ids +2000000.
    */
  private def scenario() = {
    import spark.implicits._
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

  test("index-backed probe flags exactly the ids the in-plan recompute flags") {
    import spark.implicits._
    val (corpus, batch) = scenario()
    val dir = tmpDir("equiv")
    SignatureIndex.build(corpus, "doc_id", "text", dir)
    val indexed = Decontamination
      .batchNearDuplicateIdsIndexed(corpus, batch, "doc_id", "text", dir, threshold = 0.7)
      .as[Long].collect().toSet
    val u = corpus.withColumn("is_new", lit(false))
      .unionByName(batch.withColumn("is_new", lit(true)))
    val recomputed = Decontamination
      .batchNearDuplicateIds(u, "doc_id", "text", $"is_new", threshold = 0.7)
      .as[Long].collect().toSet
    assert(indexed.nonEmpty, "scenario must produce at least one flagged batch doc")
    assert(indexed == recomputed,
      s"index-backed flag set diverged: only-indexed=${(indexed -- recomputed).take(5)} " +
        s"only-recomputed=${(recomputed -- indexed).take(5)}")
  }

  test("merged shard indexes probe identically to a whole-built index") {
    import spark.implicits._
    val (corpus, batch) = scenario()
    val whole = tmpDir("whole")
    SignatureIndex.build(corpus, "doc_id", "text", whole)
    // shard on doc-id parity; shard 1 additionally carries part of its
    // corpus as an APPEND component, so the merge exercises the full
    // listing (epoch + live batch dirs), not just epochs
    val s0 = tmpDir("shard0")
    val s1 = tmpDir("shard1")
    SignatureIndex.build(corpus.filter($"doc_id" % 2 === 0), "doc_id", "text", s0)
    SignatureIndex.build(
      corpus.filter($"doc_id" % 2 === 1 && $"doc_id" % 5 =!= 2), "doc_id", "text", s1)
    SignatureIndex.append(
      corpus.filter($"doc_id" % 2 === 1 && $"doc_id" % 5 === 2), "doc_id", "text",
      s1, batchId = 0L)
    val merged = tmpDir("merged")
    SignatureIndex.merge(spark, Seq(s0, s1), merged)
    def flags(dir: String): Set[Long] = SignatureIndex
      .probeNearDuplicateIds(spark, dir, corpus, batch, "doc_id", "text", 0.7)
      .as[Long].collect().toSet
    val w = flags(whole)
    assert(w.nonEmpty, "scenario must flag at least one batch doc")
    assert(flags(merged) == w, "merged index diverged from the whole-built index")
    // membership row sets are identical too (merge is a pure union)
    val mw = SignatureIndex.members(spark, whole)
      .select($"band", $"bkey", $"doc_id")
    val mm = SignatureIndex.members(spark, merged)
      .select($"band", $"bkey", $"doc_id")
    assert(mw.exceptAll(mm).isEmpty && mm.exceptAll(mw).isEmpty)
  }

  test("capped build admits the lowest-id docs per bucket, never more than cap") {
    import spark.implicits._
    // four exact duplicates collide in every band's bucket
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (3L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (4L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (9L, "a completely unrelated document about spark partitioning")).toDF("doc_id", "text")
    val dir = tmpDir("cap")
    SignatureIndex.build(docs, "doc_id", "text", dir, bucketCap = 2)
    val byBucket = SignatureIndex.members(spark, dir)
      .groupBy($"band", $"bkey").agg(collect_set($"doc_id").as("ids"))
      .select($"ids").as[Seq[Long]].collect()
    assert(byBucket.forall(_.size <= 2), "bucket over cap")
    // the duplicate quartet's buckets must keep {1, 2} (lowest ids)
    val dupBuckets = byBucket.filter(ids => ids.exists(Set(1L, 2L, 3L, 4L)))
    assert(dupBuckets.nonEmpty && dupBuckets.forall(_.toSet.subsetOf(Set(1L, 2L, 9L))),
      s"capped admission must keep lowest ids: ${dupBuckets.take(3)}")
    // sigs only for admitted (reachable) docs
    val sigIds = SignatureIndex.sigs(spark, dir).select($"doc_id").as[Long].collect().toSet
    assert(!sigIds.contains(3L) && !sigIds.contains(4L),
      "sigs must exclude docs admitted to zero buckets")
  }

  test("a stream-built index is probe-able through SignatureIndex") {
    import spark.implicits._
    val corpus = tables.documents.select($"doc_id", $"text").limit(200)
    val out = tmpDir("streamout"); val idx = tmpDir("streamidx")
    graft.streaming.DedupStreams.dedupOnce(corpus, out, idx, threshold = 0.7)
    val m = SignatureIndex.members(spark, idx)
    assert(m.columns.toSet == Set("band", "bkey", "doc_id"))
    assert(m.count() > 0, "stream-built members table must be readable")
    // probing the stream-built index with an exact copy of a retained doc
    // flags it (the retained corpus is indexed under the same banding)
    val retained = spark.read.parquet(out)
    val one = retained.orderBy($"doc_id").limit(1)
      .select(($"doc_id" + 5000000L).as("doc_id"), $"text")
    val flagged = SignatureIndex.probeNearDuplicateIds(
      spark, idx, retained.select($"doc_id", $"text"), one, "doc_id", "text", 0.7)
      .as[Long].collect()
    assert(flagged.length == 1, s"exact copy of an indexed doc must be flagged: $flagged")
  }

  test("a batch-built index seeds the streaming ingest (epoch -1 precedes batch 0)") {
    import spark.implicits._
    val corpus = tables.documents.select($"doc_id", $"text").limit(100)
    val out = tmpDir("seedout"); val idx = tmpDir("seedidx")
    SignatureIndex.build(corpus, "doc_id", "text", idx)
    // stream batch 0 carries one exact duplicate of an indexed doc and
    // one novel doc: the duplicate must be dropped against the seeded
    // index, the novel doc retained
    val dup = corpus.orderBy($"doc_id").limit(1)
      .select(($"doc_id" + 5000000L).as("doc_id"), $"text")
    val novel = Seq((9000000L, "a genuinely novel document with fresh unseen content entirely"))
      .toDF("doc_id", "text")
    graft.streaming.DedupStreams.dedupOnce(dup.unionByName(novel), out, idx, threshold = 0.7)
    val kept = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(9000000L),
      s"seeded stream must drop the indexed duplicate and keep the novel doc: $kept")
  }

  test("an index seeded AFTER the stream first touched the dir still drops duplicates") {
    import spark.implicits._
    // order of operations is the hazard: the stream's first trigger caches
    // a driver-side probe state for the (then-empty) dir; the batch build
    // then seeds compacted=-1 out of band. The probe must notice the
    // uncovered component and rebuild — a stale bloom would silently
    // false-negative every seeded key and retain exact duplicates.
    val corpus = tables.documents.select($"doc_id", $"text").limit(100)
    val idx = tmpDir("lateseed")
    val novel0 = Seq((8000000L, "an early novel document before the corpus seed arrives"))
      .toDF("doc_id", "text")
    graft.streaming.DedupStreams.dedupOnce(novel0, tmpDir("lateout0"), idx, threshold = 0.7)
    SignatureIndex.build(corpus, "doc_id", "text", idx)
    val dup = corpus.orderBy($"doc_id").limit(1)
      .select(($"doc_id" + 5000000L).as("doc_id"), $"text")
    val novel = Seq((9000000L, "a genuinely novel document with fresh unseen content entirely"))
      .toDF("doc_id", "text")
    val out = tmpDir("lateout1")
    graft.streaming.DedupStreams.dedupOnce(dup.unionByName(novel), out, idx, threshold = 0.7)
    val kept = spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(9000000L),
      s"late-seeded index must still drop the duplicate (stale-bloom hazard): $kept")
  }

  test("append makes admitted docs probe-visible; excludeBatch restores the as-of view") {
    import spark.implicits._
    val corpus = tables.documents.select($"doc_id", $"text").limit(100)
    val idx = tmpDir("append")
    SignatureIndex.build(corpus, "doc_id", "text", idx)
    val admitted = Seq(
      (7000001L, "a freshly admitted refresh document with plenty of novel content"),
      (7000002L, "another admitted document carrying entirely different novel text"))
      .toDF("doc_id", "text")
    SignatureIndex.append(admitted, "doc_id", "text", idx, batchId = 0L)
    val corpus2 = corpus.unionByName(admitted)
    // an exact copy of an appended doc must be flagged through the index
    val probe = Seq((7100001L, "a freshly admitted refresh document with plenty of novel content"))
      .toDF("doc_id", "text")
    val flagged = SignatureIndex.probeNearDuplicateIds(
      spark, idx, corpus2, probe, "doc_id", "text", 0.7).as[Long].collect()
    assert(flagged.toSet == Set(7100001L),
      s"copy of an appended doc must be flagged: ${flagged.toSeq}")
    // the as-of-before-append view (a replayed refresh's own batch id)
    // must NOT see the appended component
    val asOf = SignatureIndex.probeNearDuplicateIds(
      spark, idx, corpus2, probe, "doc_id", "text", 0.7,
      excludeBatch = Some(0L)).as[Long].collect()
    assert(asOf.isEmpty,
      s"excludeBatch must hide the appended component: ${asOf.toSeq}")
  }

  test("append replay overwrites its own component (idempotent)") {
    import spark.implicits._
    val corpus = tables.documents.select($"doc_id", $"text").limit(50)
    val idx = tmpDir("replay")
    SignatureIndex.build(corpus, "doc_id", "text", idx)
    val admitted = Seq((7000001L, "an admitted refresh document with plenty of novel content"))
      .toDF("doc_id", "text")
    SignatureIndex.append(admitted, "doc_id", "text", idx, batchId = 0L)
    val before = SignatureIndex.members(spark, idx).count()
    SignatureIndex.append(admitted, "doc_id", "text", idx, batchId = 0L)
    assert(SignatureIndex.members(spark, idx).count() == before,
      "a replayed append must overwrite, not stack, its batch component")
  }

  test("append at or below the fold floor is rejected loudly") {
    import spark.implicits._
    val corpus = tables.documents.select($"doc_id", $"text").limit(50)
    val idx = tmpDir("floor")
    SignatureIndex.build(corpus, "doc_id", "text", idx) // epoch compacted=-1
    val docs = Seq((7000001L, "some admitted document text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      SignatureIndex.append(docs, "doc_id", "text", idx, batchId = -1L)
    }
    assert(e.getMessage.contains("fold floor"),
      s"sub-floor append must name the floor: ${e.getMessage}")
  }

  test("a stream-built index accepts batch appends (ids stack above the stream's)") {
    import spark.implicits._
    val corpus = tables.documents.select($"doc_id", $"text").limit(100)
    val out = tmpDir("mixout"); val idx = tmpDir("mixidx")
    graft.streaming.DedupStreams.dedupOnce(corpus, out, idx, threshold = 0.7) // batch=0
    val admitted = Seq(
      (7000001L, "a batch-admitted document appended after the stream's own trigger"))
      .toDF("doc_id", "text")
    SignatureIndex.append(admitted, "doc_id", "text", idx, batchId = 1000000L)
    val retained = spark.read.parquet(out).select($"doc_id", $"text")
    val probe = Seq((7100001L, "a batch-admitted document appended after the stream's own trigger"))
      .toDF("doc_id", "text")
    val flagged = SignatureIndex.probeNearDuplicateIds(
      spark, idx, retained.unionByName(admitted), probe, "doc_id", "text", 0.7)
      .as[Long].collect()
    assert(flagged.toSet == Set(7100001L),
      s"append onto a stream-built index must be probe-visible: ${flagged.toSeq}")
  }

  test("appended components fold under compact; probe results are unchanged") {
    import spark.implicits._
    val corpus = tables.documents.select($"doc_id", $"text").limit(100)
    val idx = tmpDir("compactb")
    SignatureIndex.build(corpus, "doc_id", "text", idx)
    val admitted = Seq(
      (7000001L, "first refresh admitted a document with plenty of novel content"),
      (7000002L, "second refresh admitted different text with its own novel words"),
      (7000003L, "third refresh admitted yet another entirely distinct document"))
      .toDF("doc_id", "text")
    admitted.collect().zipWithIndex.foreach { case (r, i) =>
      SignatureIndex.append(
        Seq((r.getLong(0), r.getString(1))).toDF("doc_id", "text"),
        "doc_id", "text", idx, batchId = i.toLong)
    }
    val corpus2 = corpus.unionByName(admitted)
    val probe = admitted.select(($"doc_id" + 100000L).as("doc_id"), $"text")
    def flags(): Set[Long] = SignatureIndex.probeNearDuplicateIds(
      spark, idx, corpus2, probe, "doc_id", "text", 0.7).as[Long].collect().toSet
    val before = flags()
    assert(before == Set(7100001L, 7100002L, 7100003L),
      s"all three appended docs must be probe-visible pre-compact: $before")
    SignatureIndex.compact(spark, idx, upTo = 2L)
    val names = {
      val dir = new org.apache.hadoop.fs.Path(s"$idx/members")
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(dir).toSeq.map(_.getPath.getName)
    }
    assert(!names.exists(_.startsWith("batch=")),
      s"compact(upTo=2) must fold all three batch dirs: $names")
    assert(flags() == before,
      "fold must be a pure concatenation: probe flags unchanged")
    // post-fold appends stack above the new floor
    SignatureIndex.append(
      Seq((7000004L, "a fourth refresh document appended after the fold"))
        .toDF("doc_id", "text"), "doc_id", "text", idx, batchId = 3L)
    val p4 = Seq((7100004L, "a fourth refresh document appended after the fold"))
      .toDF("doc_id", "text")
    val f4 = SignatureIndex.probeNearDuplicateIds(
      spark, idx,
      corpus2.unionByName(Seq((7000004L, "a fourth refresh document appended after the fold"))
        .toDF("doc_id", "text")),
      p4, "doc_id", "text", 0.7).as[Long].collect().toSet
    assert(f4 == Set(7100004L), s"append after compact must be probe-visible: $f4")
  }

  test("probing with mismatched derivation params fails loudly") {
    import spark.implicits._
    val corpus = tables.documents.select($"doc_id", $"text").limit(50)
    val dir = tmpDir("params")
    SignatureIndex.build(corpus, "doc_id", "text", dir)
    val batch = corpus.select(($"doc_id" + 1000000L).as("doc_id"), $"text").limit(5)
    val e = intercept[IllegalArgumentException] {
      SignatureIndex.probeNearDuplicateIds(
        spark, dir, corpus, batch, "doc_id", "text", 0.7,
        cfg = SignatureIndex.Config(shingleN = 5))
    }
    assert(e.getMessage.contains("params"),
      s"mismatch must name the persisted params: ${e.getMessage}")
  }
}
