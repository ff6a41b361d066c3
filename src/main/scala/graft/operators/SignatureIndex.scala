package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH signature index — THE corpus-side artifact the
  * 100 TB refresh story needs: shingle → signature → band-key derivation
  * runs over the retained corpus ONCE (at build or ingest time), and
  * every subsequent batch admission probes the persisted banded
  * membership instead of re-deriving O(corpus) shingles per refresh.
  *
  * == Layout (shared with the streaming ingest) ==
  *
  * {{{
  * indexDir/members/{compacted=<M> | batch=<id>}/   (band, bkey, doc_id)
  * indexDir/sigs/   {compacted=<M> | batch=<id>}/   (doc_id, sig8)
  * }}}
  *
  * This is exactly the table pair [[graft.streaming.DedupStreams]]
  * maintains incrementally — the listing/epoch logic lives HERE and the
  * stream delegates to it, so a batch-built index can seed a stream and
  * a stream-built index can serve batch admission probes. A batch build
  * writes one `compacted=-1` epoch (streaming batch ids are >= 0, so
  * batch dirs stack strictly after it and the stream's own batch 0 is
  * never shadowed). On a cluster the same two tables sit behind a
  * key-value/state-store interface for point lookups — bucket-keyed
  * membership + doc-keyed signatures, both append-only, is deliberately
  * a KV schema.
  *
  * Members files are range-partitioned and sorted by `bkey`, so a probe
  * that pushes a bkey predicate prunes files by footer min/max and row
  * groups by stats — the columnar approximation of the point lookup.
  *
  * == Probe semantics ==
  *
  * [[probeNearDuplicateIds]] is the index-backed spelling of
  * [[Decontamination.batchNearDuplicateIds]] and produces the IDENTICAL
  * flag set (spec-asserted): candidates come from (band, bkey) equality
  * against the persisted membership — the same collisions the recompute
  * path derives from its in-plan corpus banding, because signatures are
  * a deterministic function of text — and the refine is the same EXACT
  * shingle-Jaccard kernel ([[Dedup.jaccardForPairs]]), evaluated only on
  * the candidate corpus docs (their text is fetched by a candidate-id
  * semi-join; at 100 TB an id-bucketed corpus table makes that fetch a
  * bucket-pruned scan). The index affects WORK, never the result:
  * per-refresh cost drops from O(corpus + batch) to O(batch + hits).
  *
  * Id contract: corpus and batch ids must be disjoint (the refine keys
  * shingles by id across both sides — the same contract the recompute
  * path's union frame carries).
  */
object SignatureIndex {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Derivation parameters; must match between build and probe (and are
    * persisted alongside the index for validation). Defaults are the
    * library-wide banding (see MinHashLSH scaladoc).
    */
  final case class Config(
      shingleN: Int = 3, numPerms: Int = 128, bands: Int = 32, rowsPerBand: Int = 4) {
    MinHashLSH.requireBandsFit(numPerms, bands, rowsPerBand)
  }

  private val ParamsFile = "params.json"

  /** Persist the derivation params beside the index (first writer wins;
    * [[build]] overwrites — it also overwrites the base epoch). Probes
    * validate against this file: a banding mismatch between build and
    * probe otherwise finds zero (band, bkey) collisions and silently
    * admits every duplicate.
    */
  private[graft] def writeParams(
      fs: org.apache.hadoop.fs.FileSystem, indexDir: String, cfg: Config,
      overwrite: Boolean = false): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/$ParamsFile")
    if (overwrite || !fs.exists(p)) {
      val out = fs.create(p, true)
      try out.write(
        (s"""{"shingleN":${cfg.shingleN},"numPerms":${cfg.numPerms},""" +
          s""""bands":${cfg.bands},"rowsPerBand":${cfg.rowsPerBand}}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Fail loudly when a probe's params disagree with the persisted ones.
    * A missing file (pre-params index) validates vacuously.
    */
  private[graft] def validateParams(
      spark: SparkSession, indexDir: String, cfg: Config): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/$ParamsFile")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(name: String): Option[Int] =
      s""""$name":(\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    val persisted = (field("shingleN"), field("numPerms"), field("bands"), field("rowsPerBand"))
    val given = (Some(cfg.shingleN), Some(cfg.numPerms), Some(cfg.bands), Some(cfg.rowsPerBand))
    require(persisted == given,
      s"SignatureIndex at $indexDir was built with params $txt but probed with $cfg — " +
        "band keys would never collide; rebuild the index or pass the matching Config")
  }

  // ---- listing / epoch selection (shared with DedupStreams) -------------

  /** One index table's live components: the newest complete
    * `compacted=<M>` epoch, the `run=<R>` minor-fold dirs after it, and
    * the raw `batch=<id>` dirs after the newest run — the two-level
    * (LSM-style) layout that keeps BOTH the per-trigger dir count and
    * the amortized compaction work bounded: minor folds cost O(folded
    * batches), the epoch is rewritten only when the runs reach a
    * constant fraction of its size (geometric — each row is re-written
    * O(log) times over the stream's life, never O(1) rewrites of a
    * linearly growing epoch per fold window, which was the measured
    * +6% drain-slope term).
    */
  private[graft] final case class TableListing(
      epoch: Option[Long], runs: Seq[Long], batches: Seq[Long]) {
    def isEmpty: Boolean = epoch.isEmpty && runs.isEmpty && batches.isEmpty
    def dirNames: Seq[String] =
      epoch.map(e => s"compacted=$e").toSeq ++ runs.map(r => s"run=$r") ++
        batches.map(b => s"batch=$b")
  }

  /** List one index table dir. Folded dirs (`compacted=`/`run=`) must
    * carry `_SUCCESS` — a crashed fold write is invisible; a batch dir
    * whose id is covered by a fold is a crash leftover and is ignored.
    * Hadoop FileSystem API — java.nio would silently see nothing on
    * hdfs:///s3a:// paths and disable cross-batch dedup without an
    * error. Non-numeric strays are ignored rather than fatal.
    */
  private[graft] def listTable(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): TableListing = {
    if (!fs.exists(dir)) return TableListing(None, Nil, Nil)
    val names = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    def ids(prefix: String, needSuccess: Boolean): Seq[Long] = names
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption)
      .filter(id => !needSuccess ||
        fs.exists(new org.apache.hadoop.fs.Path(dir, s"$prefix$id/_SUCCESS")))
    val epochs = ids("compacted=", needSuccess = true)
    val m = if (epochs.nonEmpty) Some(epochs.max) else None
    val runs = ids("run=", needSuccess = true).filter(r => m.forall(r > _)).sorted
    val floor = (m.toSeq ++ runs).foldLeft(Long.MinValue)(math.max)
    TableListing(m, runs, ids("batch=", needSuccess = false).filter(_ > floor).sorted)
  }

  /** Readable paths of one index table (`members` or `sigs`), newest
    * epoch + runs + live batch dirs, optionally excluding one batch id
    * (the stream's current trigger excludes its own about-to-be-
    * overwritten partition).
    */
  private[graft] def tablePaths(
      spark: SparkSession, indexDir: String, table: String,
      excludeBatch: Option[Long] = None): Seq[String] =
    componentNames(spark, indexDir, table, excludeBatch)
      .map(n => s"$indexDir/$table/$n")

  /** Component dir NAMES of one index table (the coverage unit
    * [[InMemoryMembershipStore.ensureCovers]] tracks). */
  private[graft] def componentNames(
      spark: SparkSession, indexDir: String, table: String,
      excludeBatch: Option[Long] = None): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$indexDir/$table")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val l = listTable(fs, dir)
    l.copy(batches = l.batches.filterNot(excludeBatch.contains)).dirNames
  }

  /** The banded membership (band, bkey, doc_id) across all epochs.
    * `excludeBatch` drops one `batch=<id>` component from the listing —
    * the as-of-before-my-own-append view a replayed refresh needs (same
    * contract as the streaming trigger, which excludes its own
    * about-to-be-overwritten partition).
    */
  def members(
      spark: SparkSession, indexDir: String,
      excludeBatch: Option[Long] = None): DataFrame = {
    val paths = tablePaths(spark, indexDir, "members", excludeBatch)
    require(paths.nonEmpty, s"no signature index at $indexDir/members")
    spark.read.parquet(paths: _*)
  }

  /** The 1-byte-component signature table (doc_id, sig8) across all
    * epochs — b-bit minwise estimates for consumers that want a cheap
    * similarity screen (the streaming path); the exact-refine probe
    * below never reads it.
    */
  def sigs(spark: SparkSession, indexDir: String): DataFrame = {
    val paths = tablePaths(spark, indexDir, "sigs")
    require(paths.nonEmpty, s"no signature index at $indexDir/sigs")
    spark.read.parquet(paths: _*)
  }

  /** Build the index over `docs` in one batch pass: one shingle +
    * signature + band derivation, written as the `compacted=-1` base
    * epoch. `bucketCap` (default uncapped) applies the same write-side
    * lowest-id bucket admission the streaming ingest enforces — leave
    * uncapped when probe results must exactly match an uncapped
    * recompute; cap when hot-bucket cost bounds matter more than
    * unconditional recall (MinHashLSH.DefaultBucketCap scaladoc).
    */
  def build(
      docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      cfg: Config = Config(), bucketCap: Int = Int.MaxValue): Unit = {
    val sigs = MinHashLSH
      .signatures(Dedup.charShingles(docs, idCol, textCol, cfg.shingleN), cfg.numPerms)
      .withColumn("sig8", transform(col("sig"), x => x.bitwiseAND(lit(255L))))
      .cache()
    try {
      val bandedAll = MinHashLSH.bandKeys(sigs, cfg.bands, cfg.rowsPerBand)
        .select(col("doc_id"), col("band"), col("bkey"))
      val banded =
        if (bucketCap == Int.MaxValue) bandedAll
        else {
          val w = Window.partitionBy(col("band"), col("bkey")).orderBy(col("doc_id"))
          bandedAll.withColumn("__r", row_number().over(w))
            .filter(col("__r") <= bucketCap).drop("__r")
        }
      // range-partition + sort by bkey: probe predicates prune files by
      // min/max and row groups by stats (see scaladoc). 8 files keeps the
      // per-probe footer count constant at this scale; a cluster build
      // would size this by corpus bytes.
      banded.repartitionByRange(8, col("bkey")).sortWithinPartitions(col("bkey"))
        .write.mode("overwrite").parquet(s"$indexDir/members/compacted=-1")
      // signatures only for docs reachable from the membership (under a
      // cap, a doc admitted to zero buckets can never be probed)
      val sigOut =
        if (bucketCap == Int.MaxValue) sigs.select(col("doc_id"), col("sig8"))
        else sigs.select(col("doc_id"), col("sig8")).join(
          banded.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      sigOut.coalesce(8).write.mode("overwrite").parquet(s"$indexDir/sigs/compacted=-1")
      val p = new org.apache.hadoop.fs.Path(indexDir)
      writeParams(p.getFileSystem(docs.sparkSession.sessionState.newHadoopConf()),
        indexDir, cfg, overwrite = true)
    } finally { sigs.unpersist(); () }
  }

  /** Append one refresh batch's docs to an existing index as a
    * `batch=<id>` component — the batch-refresh spelling of the
    * streaming trigger's incremental write, and the missing half of the
    * production loop: probe → admit → APPEND, so the next refresh's
    * probe sees this refresh's admissions without any corpus
    * re-derivation. Cost is O(batch): one shingle + signature + band
    * pass over `docs` only; the existing epochs are never read.
    *
    * The caller names `batchId`, which makes the write deterministic
    * and idempotent — a replay overwrites its own two dirs, so a crash
    * mid-append heals on rerun (same contract as the streaming
    * foreachBatch write at DedupStreams). `batchId` must sit strictly
    * above the newest folded component (the listing ignores batch dirs
    * a fold covers — see [[listTable]]) and is rejected loudly
    * otherwise. Appends are uncapped: write-side bucket admission needs
    * cross-epoch occupancy, which is the streaming ingest's job — a
    * capped index that takes batch appends should route them through
    * the stream.
    *
    * Sigs land before members (matching the fold ordering contract):
    * a reader that lists between the two writes may see a member whose
    * signature is missing, never the reverse — the exact-refine probe
    * ignores sigs entirely and the streaming probe treats a missing
    * sig as a non-hit that the next trigger's rebuild heals.
    */
  def append(
      docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      batchId: Long, cfg: Config = Config()): Unit = {
    val spark = docs.sparkSession
    validateParams(spark, indexDir, cfg)
    val membersDir = new org.apache.hadoop.fs.Path(s"$indexDir/members")
    val fs = membersDir.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(membersDir),
      s"no signature index at $indexDir/members — build() or a stream must seed it first")
    val l = listTable(fs, membersDir)
    val floor = (l.epoch.toSeq ++ l.runs).foldLeft(Long.MinValue)(math.max)
    require(batchId > floor,
      s"append batchId=$batchId is at or below the newest fold floor $floor of " +
        s"$indexDir — the listing would ignore it; pick an id above every folded component")
    val sigs = MinHashLSH
      .signatures(Dedup.charShingles(docs, idCol, textCol, cfg.shingleN), cfg.numPerms)
      .withColumn("sig8", transform(col("sig"), x => x.bitwiseAND(lit(255L))))
      .cache()
    try {
      val banded = MinHashLSH.bandKeys(sigs, cfg.bands, cfg.rowsPerBand)
        .select(col("doc_id"), col("band"), col("bkey"))
      sigs.select(col("doc_id"), col("sig8"))
        .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/sigs/batch=$batchId")
      // bkey-sorted like the epochs, so probe predicates prune row
      // groups in appended components too; one file — a refresh batch is
      // batch-scale by definition (a corpus-scale write is a build)
      banded.repartitionByRange(1, col("bkey")).sortWithinPartitions(col("bkey"))
        .write.mode("overwrite").parquet(s"$indexDir/members/batch=$batchId")
    } finally { sigs.unpersist(); () }
  }

  /** Maximum `run=` dirs before a minor fold absorbs the existing runs
    * too — bounds the reader's dir/footer count between majors. */
  private[graft] val MaxRuns = 8

  /** Two-level size-tiered compaction (the LSM shape), shared by the
    * streaming ingest (every `compactEvery` triggers) and long-lived
    * batch-refresh indexes (call it every K appends — without folds an
    * append-per-refresh index accumulates O(refreshes) `batch=` dirs
    * and the probe's listing/footer cost grows linearly). Live
    * `batch=* <= upTo` dirs fold into a `run=<upTo>` MINOR dir (cost
    * O(folded batches)) unless the accumulated runs have reached 1/4 of
    * the epoch's bytes, at which point everything folds into a new
    * `compacted=<upTo>` epoch (MAJOR). The geometric trigger means each
    * row is epoch-rewritten O(log) times over the index's life; an
    * every-fold-is-major scheme rewrites the ENTIRE (linearly growing)
    * epoch per fold window — a measured +6% drain-slope term. Minor
    * folds absorb existing runs once [[MaxRuns]] accumulate, so the
    * reader's dir count stays bounded.
    *
    * All folds are pure concatenation (caps were enforced at write
    * time), written KEY-SORTED (sigs by doc_id, members by bkey) so
    * probe predicates prune row groups. Deterministic for a given
    * `upTo`, so a replay re-running one is harmless; each fold's sigs
    * dir is written before its members dir, readers require `_SUCCESS`
    * on folded dirs, and covered batch dirs are only deleted after both
    * writes land.
    */
  def compact(spark: SparkSession, indexDir: String, upTo: Long): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val membersDir = new org.apache.hadoop.fs.Path(s"$indexDir/members")
    val sigsDir = new org.apache.hadoop.fs.Path(s"$indexDir/sigs")
    val fs = membersDir.getFileSystem(conf)
    val l = listTable(fs, membersDir)
    val foldB = l.batches.filter(_ <= upTo)
    if (foldB.isEmpty) return // already folded through upTo (e.g. a replay)
    def bytesOf(name: String): Long =
      scala.util.Try(fs.getContentSummary(
        new org.apache.hadoop.fs.Path(membersDir, name)).getLength).getOrElse(0L)
    val epochBytes = l.epoch.map(e => bytesOf(s"compacted=$e")).getOrElse(0L)
    val pendingBytes = l.runs.map(r => bytesOf(s"run=$r")).sum +
      foldB.map(b => bytesOf(s"batch=$b")).sum
    val major = l.epoch.isEmpty || pendingBytes * 4 >= epochBytes
    val mergeRuns = major || l.runs.size >= MaxRuns
    val src = TableListing(
      if (major) l.epoch else None,
      if (mergeRuns) l.runs else Nil,
      foldB)
    val target = if (major) s"compacted=$upTo" else s"run=$upTo"
    def paths(dir: String): Seq[String] = src.dirNames.map(n => s"$dir/$n")
    spark.read.parquet(paths(s"$indexDir/sigs"): _*)
      .repartitionByRange(8, col("doc_id")).sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(s"$indexDir/sigs/$target")
    spark.read.parquet(paths(s"$indexDir/members"): _*)
      .repartitionByRange(8, col("bkey")).sortWithinPartitions(col("bkey"))
      .write.mode("overwrite").parquet(s"$indexDir/members/$target")
    log.info(s"${if (major) "MAJOR" else "minor"} fold of signature index through " +
      s"batch $upTo (${foldB.size} batch dir(s)" +
      s"${if (mergeRuns && l.runs.nonEmpty) s" + ${l.runs.size} run(s)" else ""}" +
      s"${if (major) l.epoch.fold("")(e => s" + epoch $e") else ""} -> $target)")
    // cleanup is best-effort: leftovers are ignored by readers (covered
    // ids) and retried by the next fold. Raw listing, not listTable —
    // that helper hides exactly the now-covered ids that need deleting.
    for (dir <- Seq(membersDir, sigsDir) if fs.exists(dir)) {
      val stale = fs.listStatus(dir).toSeq.map(_.getPath.getName).filter { n =>
        def id(prefix: String): Option[Long] =
          if (n.startsWith(prefix))
            scala.util.Try(n.stripPrefix(prefix).toLong).toOption
          else None
        id("batch=").exists(_ <= upTo) ||
          id("run=").exists(r => if (major) r <= upTo else mergeRuns && r < upTo) ||
          (major && id("compacted=").exists(_ < upTo))
      }
      stale.foreach(n => scala.util.Try(
        fs.delete(new org.apache.hadoop.fs.Path(dir, n), true)))
    }
  }

  /** Merge shard-built indexes into one — the distributed BUILD story at
    * 100 TB: one job cannot (and should not) derive signatures over the
    * whole corpus, so each corpus shard builds its own index in parallel
    * (the O(shard) shingle+signature derivation — the expensive part),
    * and the merge is a pure byte-level union of the already-derived
    * (band, bkey, doc_id) / (doc_id, sig8) rows: one range-partitioned
    * shuffle of index rows (orders of magnitude narrower than text),
    * re-sorted so probe pushdown prunes the merged epoch exactly like a
    * whole-built one. No text is read, no signature recomputed.
    *
    * Contract: shard doc-id sets are disjoint (the build contract) and
    * every shard carries the same derivation params (validated). Shards
    * must be uncapped (write-side bucket admission is per-shard and
    * cannot be re-enforced globally from membership alone — same note as
    * [[append]]); the merged epoch is written as `compacted=-1`, so the
    * result accepts appends/streams exactly like a fresh [[build]].
    * Sigs land before members (the fold ordering contract).
    */
  def merge(
      spark: SparkSession, shardDirs: Seq[String], destDir: String,
      cfg: Config = Config()): Unit = {
    require(shardDirs.nonEmpty, "merge needs at least one shard index")
    shardDirs.foreach(d => validateParams(spark, d, cfg))
    val memberPaths = shardDirs.flatMap(d => tablePaths(spark, d, "members"))
    val sigPaths = shardDirs.flatMap(d => tablePaths(spark, d, "sigs"))
    require(memberPaths.nonEmpty,
      s"no signature index members under any of $shardDirs")
    spark.read.parquet(sigPaths: _*)
      .repartitionByRange(8, col("doc_id")).sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(s"$destDir/sigs/compacted=-1")
    spark.read.parquet(memberPaths: _*)
      .repartitionByRange(8, col("bkey")).sortWithinPartitions(col("bkey"))
      .write.mode("overwrite").parquet(s"$destDir/members/compacted=-1")
    val p = new org.apache.hadoop.fs.Path(destDir)
    writeParams(p.getFileSystem(spark.sessionState.newHadoopConf()),
      destDir, cfg, overwrite = true)
    log.info(s"merged ${shardDirs.size} shard indexes -> $destDir")
  }

  /** Raw candidate (da = corpus member, db = batch doc) pairs from the
    * persisted membership: batch band keys derived in-plan (through the
    * shared MinHashLSH.bandKeys, so banding can never drift from the
    * build), broadcast against the index scan — one narrow pass over the
    * members table, no corpus re-shingling. Per-band duplicates kept;
    * the exact refine dedups after thresholding (MinHashLSH
    * .candidatePairsRaw trade).
    */
  private def probeCandidates(
      spark: SparkSession, indexDir: String, batchSh: DataFrame,
      cfg: Config, excludeBatch: Option[Long]): DataFrame = {
    val batchBanded = MinHashLSH.bandKeys(
      MinHashLSH.signatures(batchSh, cfg.numPerms), cfg.bands, cfg.rowsPerBand)
      .select(col("doc_id").as("db"), col("band"), col("bkey"))
    members(spark, indexDir, excludeBatch)
      .select(col("band"), col("bkey"), col("doc_id").as("da"))
      .join(broadcast(batchBanded), Seq("band", "bkey"))
      .select(col("da"), col("db"))
  }

  /** Store-backed spelling of [[probeCandidates]]: the batch's banded
    * rows are collected (refresh batches are batch-scale by contract —
    * hard-capped at [[MaxStoreProbeRows]]), each DISTINCT key resolved
    * through ONE store point lookup, and the hit rows (one per member
    * per probed bucket — occupancy-bounded, NOT pair-bounded) re-enter
    * the plan as a literal frame that joins the batch side back on
    * (band, bkey). The pair MULTISET therefore materializes on the
    * executors, never the driver: a corpus hot bucket probed by its
    * own thousands of exact-copy batch docs multiplies |bucket|×|probes|
    * pairs, which a driver-side flatMap spelling OOM'd on at the sf1
    * tier — the same nothing-multiset-proportional-on-the-driver rule
    * the streaming kernel's hit frame follows. Per-band duplicate
    * pairs are kept, exactly as the frame join keeps one row per
    * (band, bkey) collision — the refine dedups after thresholding, so
    * the flag set is identical.
    */
  private def storeCandidates(
      spark: SparkSession, indexDir: String, batchSh: DataFrame,
      cfg: Config, excludeBatch: Option[Long], store: MembershipStore): DataFrame = {
    import spark.implicits._
    val batchBanded: Array[(Long, Int, Long)] = MinHashLSH.bandKeys(
      MinHashLSH.signatures(batchSh, cfg.numPerms), cfg.bands, cfg.rowsPerBand)
      .select(col("doc_id"), col("band"), col("bkey"))
      .as[(Long, Int, Long)].collect()
    require(batchBanded.length <= MaxStoreProbeRows,
      s"store-backed probe batch has ${batchBanded.length} banded rows " +
        s"(> $MaxStoreProbeRows) — this is a corpus, not a refresh batch; " +
        "use the frame-join probe (store = None)")
    store match {
      case im: InMemoryMembershipStore => im.ensureCovers(
        spark, indexDir, componentNames(spark, indexDir, "members", excludeBatch).toSet)
      // A parquet store pins ITS exclusion at construction; the call
      // site's excludeBatch cannot reach its scans, so a mismatch would
      // silently probe the excluded batch's own partial rows. Refuse
      // the divergence instead (the in-memory impl honors the call-site
      // value through the ensureCovers listing above).
      case ps: ParquetMembershipStore => require(
        ps.excludeBatch == excludeBatch,
        s"store-backed probe: ParquetMembershipStore pinned " +
          s"excludeBatch=${ps.excludeBatch} but the probe requested " +
          s"$excludeBatch — construct the store with the probe's exclusion")
      case _ => ()
    }
    val bm = store.bucketMembers(batchBanded.map(t => (t._2, t._3)).distinct)
    // ONE driver row per probed bucket, members as a packed array,
    // exploded on the executors: the flat (bucket, member) spelling
    // materialized Σ occupancy driver-side tuples — ~3M at sf0.1 when
    // near-dup probes land in the uncapped corpus index's hot buckets —
    // and the createDataset serialization of those tuples alone cost
    // more than the whole frame-join probe it replaced (q133 6.4 s →
    // 14.9 s, r11). Bucket-count rows + primitive arrays keep the
    // driver hop at probed-key scale; occupancy expands in-plan.
    val hitBuckets: Seq[(Int, Long, Array[Long])] =
      bm.toSeq.map { case ((band, bkey), ms) => (band, bkey, ms) }
    val nHits = hitBuckets.iterator.map(_._3.length.toLong).sum
    require(nHits <= MaxStoreProbeRows,
      s"store probe hit $nHits (bucket, member) rows " +
        s"(> $MaxStoreProbeRows) — occupancy of the probed buckets is " +
        "corpus-scale; use the frame-join probe (store = None)")
    val batchDf = spark.createDataset(batchBanded.toSeq).toDF("db", "band", "bkey")
    spark.createDataset(hitBuckets).toDF("band", "bkey", "das")
      .select(col("band"), col("bkey"), explode(col("das")).as("da"))
      .join(broadcast(batchDf), Seq("band", "bkey"))
      .select(col("da"), col("db"))
  }

  /** Literal bound on the collected batch banded rows the store-backed
    * probe materializes on the driver (a refresh batch is batch-scale
    * by contract — docs x bands rows; 4M ≈ 64 MB of longs).
    */
  private val MaxStoreProbeRows = 4 * 1024 * 1024

  /** Ids of `batch` docs whose exact shingle Jaccard against SOME
    * indexed corpus doc reaches `threshold` — the index-backed spelling
    * of [[Decontamination.batchNearDuplicateIds]] (identical flag set
    * when the index was built uncapped over the same corpus; see object
    * scaladoc). `corpus` supplies the TEXT of candidate corpus docs
    * only — it is filtered to candidate ids by a semi-join before any
    * shingle is derived.
    *
    * `store`: route the candidate probe through a [[MembershipStore]]
    * point lookup instead of the members-frame join — the external-KV
    * seam. Candidates (and therefore the returned flag set) are
    * IDENTICAL by the store contract (spec-pinned); only the probe's
    * WORK changes: an in-memory store makes it O(batch keys),
    * independent of index size.
    */
  def probeNearDuplicateIds(
      spark: SparkSession, indexDir: String,
      corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      cfg: Config = Config(), excludeBatch: Option[Long] = None,
      store: Option[MembershipStore] = None): DataFrame = {
    validateParams(spark, indexDir, cfg)
    // one batch shingle derivation feeds the signature agg AND the
    // refine (cache-release contract: see Dedup.jaccardPairs)
    val batchSh = Dedup.charShingles(batch, idCol, textCol, cfg.shingleN).cache()
    // cached: the candidate-id semi-join AND the refine both consume the
    // candidate pairs, and each re-derivation would re-run the batch
    // signature aggregation (the probe's dominant compute — measured
    // 5.8 s -> see PLANS.md r8 notes). Hits-scale rows.
    // Cache-release contract: see Dedup.jaccardPairs.
    val cand = (store match {
      case Some(st) => storeCandidates(spark, indexDir, batchSh, cfg, excludeBatch, st)
      case None => probeCandidates(spark, indexDir, batchSh, cfg, excludeBatch)
    }).cache()
    val candIds = cand.select(col("da").as(idCol)).distinct()
    // candidate corpus text only: hits-scale, not corpus-scale
    val corpusSh = Dedup.charShingles(
      corpus.join(candIds, Seq(idCol), "left_semi"), idCol, textCol, cfg.shingleN)
    Dedup.jaccardForPairs(
      corpusSh.union(batchSh), cand.select(col("da"), col("db")),
      threshold, pairsDistinct = false)
      .select(col("db").as(idCol))
      .distinct()
  }
}
