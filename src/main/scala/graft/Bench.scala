package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query against SPARK_GRAFT_SF_DIR and
  * prints one JSON metrics line. Queries execute into the `noop` sink so
  * every output column is actually computed — `count()` would let Catalyst
  * prune the projections being measured.
  *
  * Two passes are timed: a cold pass (first execution, absorbs residual JIT
  * and file-cache warmup) and a warm pass (steady state). The headline
  * `value` is the warm total — the number that reflects what the plans cost,
  * not what one noisy JVM start cost — with the cold totals and any failed
  * query names carried alongside so a degraded or partially failed run is
  * diagnosable from the artifact alone.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Static conf, must be set before the session exists. The default
      // generated-class cache holds 100 entries; a ~120-query registry
      // evicts continuously, so the "warm" pass was re-running Janino on
      // most stages (r4: common-query warm drifted +43% with zero code
      // changes). 10k entries keeps every stage's generated class cached
      // across both passes; metaspace cost is a few hundred MB.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // catalog registration + ANALYZE stats (SURVEY §4.2): every registry
    // query now plans against real cardinalities with CBO join reorder
    // on; the one-time analyze scan happens here, outside the per-query
    // timings
    CatalogStats.analyze(spark, sfDir)
    // warm up codegen + parquet reader once so the first measured query
    // doesn't absorb JVM/classloading cost
    Tables(spark, sfDir).lineitem.limit(1000)
      .write.format("noop").mode("overwrite").save()

    val failed = collection.mutable.LinkedHashSet[String]()
    def pass(tag: String): Seq[(String, Double)] = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += q.name
        System.err.println(s"[bench:$tag] ${q.name} FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench:$tag] ${q.name}%-28s ${dt}%8.2f s")
      // drop anything a query pinned in the cache manager so storage memory
      // can't accumulate across the registry (r1's back-half degradation).
      // Audited r5: no frame is shared across registry entries (q41-q43/q53
      // re-read the on-disk fixture corpus; every .cache() in the operators
      // is scoped to one query's pipeline), so the blanket clear drops only
      // the finished query's own intermediates — it is not the source of
      // the r4 warm drift (that was codegen-cache eviction, fixed above).
      spark.catalog.clearCache()
      q.name -> dt
    }

    val cold = pass("cold")
    val warm = pass("warm")

    // Solo re-measure of the slowest warm queries: each gets a fresh timing
    // after the full sweep, so its number reflects steady-state plan cost
    // with its generated classes resident — the standalone-warm figure a
    // user profiling one query would see, free of any residual sweep noise.
    val soloNames = warm.sortBy(-_._2).take(10).map(_._1)
    val solo: Seq[(String, Double)] = SparkEntry.registry
      .filter(q => soloNames.contains(q.name)).flatMap { q =>
        val t0 = System.nanoTime()
        val ok =
          try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            // a failed solo execution is recorded in `failed` and DROPPED
            // from the solo dict — a time-to-failure must never read as a
            // steady-state number in the artifact
            failed += s"solo:${q.name}"
            System.err.println(s"[bench:solo] ${q.name} FAILED: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench:solo] ${q.name}%-28s ${dt}%8.2f s")
        spark.catalog.clearCache()
        if (ok) Some(q.name -> dt) else None
      }

    // Streaming claims-ingest catch-up: replicate the EDI fixture corpus
    // 100x (20k files) into a watched dir and time ClaimStreams.ingest
    // draining it under Trigger.AvailableNow — the measured proof that
    // ingest is executor-bound (stateless narrow stages + file-source
    // listing), not coordination-bound. Per-batch trigger latencies come
    // from the query's progress history so the T-family cost is a number:
    // ~20 batches of 1024 files each, with the fixed per-batch planning +
    // checkpoint-fsync overhead visible as the p50/max spread. The fixture
    // corpus exists by now: the q41/q53 passes above materialize it.
    val streamJson: String = try {
      import java.nio.file.{Files, Path, Paths}
      val src = Paths.get(graft.fixtures.ClaimFixtures.EdiDir)
      val tmp = Files.createTempDirectory("bench_stream")
      // ~100 MB of replicated EDI + parquet per run — delete on exit so
      // repeated rounds don't accumulate dead corpora in /tmp
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try {
          val s = Files.walk(tmp)
          try s.sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(f => { Files.deleteIfExists(f); () })
          finally s.close()
        } catch { case _: Throwable => () } // already-gone dir: nothing to clean
      }))
      val in = tmp.resolve("in"); Files.createDirectories(in)
      var nFiles = 0
      val listing = Files.list(src)
      try listing.forEach { f =>
        if (f.getFileName.toString.endsWith(".txt")) {
          (0 until 100).foreach { r =>
            Files.copy(f, in.resolve(s"r${r}_${f.getFileName}")); nFiles += 1
          }
        }
      } finally listing.close()
      val t0 = System.nanoTime()
      val q = graft.streaming.ClaimStreams.ingest(
        spark, in.toString, tmp.resolve("out").toString, tmp.resolve("ckpt").toString)
      val finished = q.awaitTermination(600000L)
      val dt = (System.nanoTime() - t0) / 1e9
      if (!finished) { q.stop(); """null""" }
      else {
        val batchMs = q.recentProgress.toSeq
          .filter(_.numInputRows > 0)
          .map(p => Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L))
          .sorted
        val rows = spark.read.parquet(tmp.resolve("out").toString).count()
        val sec = String.format(java.util.Locale.ROOT, "%.3f", Double.box(dt))
        val (nb, p50, mx) =
          if (batchMs.isEmpty) (0, 0L, 0L)
          else (batchMs.size, batchMs(batchMs.size / 2), batchMs.last)
        System.err.println(
          s"[bench:stream] ingest $nFiles files -> $rows claims in $sec s " +
            s"($nb batches, p50 ${p50} ms, max ${mx} ms)")
        s"""{"files":$nFiles,"claims":$rows,"sec":$sec,""" +
          s""""batches":$nb,"batch_p50_ms":$p50,"batch_max_ms":$mx}"""
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench:stream] ingest FAILED: ${e.getMessage}")
      "null"
    }
    // The driver captures only the LAST 2000 chars of stdout (measured from
    // BENCH_r03.json: tail len 2000, and sbt's own "[success] ..." line eats
    // ~72 of them). Round 3's final line carried 81 full query names and ran
    // ~2.9 KB, so the capture started mid-line and the artifact recorded
    // parsed:null — the warm total was unprovable. Emission contract now:
    //   line 1: cold per-query detail, full names  (expendable if cut)
    //   line 2: warm per-query detail, full names  (expendable if cut)
    //   line 3 (LAST): compact summary that must fit the capture window with
    //     sbt's epilogue — short query keys (the unique "qNN" prefix before
    //     the first underscore), 2-decimal seconds, and a hard size guard
    //     that drops the per-query dict entirely rather than risk truncation.
    // Locale.ROOT everywhere: the f interpolator is locale-sensitive and a
    // comma-decimal JVM locale would emit invalid JSON (same class of bug as
    // the PDF sink's operand formatting).
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def cs(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def obj(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    def tot(rs: Seq[(String, Double)]) = ms(rs.map(_._2).sum)
    println(s"""{"metric":"cold_detail","cold_total":${tot(cold)},"unit":"sec","cold_queries":${obj(cold)}}""")
    println(s"""{"metric":"warm_detail","warm_total":${tot(warm)},"unit":"sec","warm_queries":${obj(warm)}}""")
    println(s"""{"metric":"solo_detail","solo_total":${tot(solo)},"unit":"sec","solo_queries":${obj(solo)}}""")
    def short(rs: Seq[(String, Double)]) = rs
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + cs(v) }
      .mkString("{", ",", "}")
    def failedArr(names: Seq[String]) = names.map("\"" + _ + "\"").mkString("[", ",", "]")
    def summary(queriesJson: String, soloJson: String, failedJson: String) =
      s"""{"metric":"total","value":${tot(warm)},"unit":"sec","queries":$queriesJson,""" +
        s""""cold_total":${tot(cold)},"solo":$soloJson,"stream_ingest":$streamJson,""" +
        s""""n_failed":${failed.size},"failed":$failedJson,"sf":"$sfDir"}"""
    // 2000-char window minus sbt epilogue (~80 incl. newline) minus margin:
    // 1800 holds ~110 short-key entries; past that the solo dict goes
    // first, then the per-query dict, then the failed list collapses to
    // its first few names (n_failed always carries the true count) —
    // whole-element drops only, never a mid-line cut. The worst case the
    // last tier guards is an everything-failed run, where the full failed
    // list alone would overflow the capture window exactly when it's
    // needed most.
    val tiers = Seq(
      summary(short(warm), short(solo), failedArr(failed.toSeq)),
      summary(short(warm), "\"truncated\"", failedArr(failed.toSeq)),
      summary("\"truncated\"", "\"truncated\"", failedArr(failed.toSeq)),
      summary("\"truncated\"", "\"truncated\"", failedArr(failed.toSeq.take(5))))
    println(tiers.find(_.length <= 1800).getOrElse(tiers.last))
    spark.stop()
  }
}
