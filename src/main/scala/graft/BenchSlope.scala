package graft

/** Scale-slope ledger runner: measure a named subset of the registry at
  * SPARK_GRAFT_SF_DIR so per-query sf1/sf0.1 scaling ratios become a
  * committed artifact instead of prose (r9 verdict item 4 — the 100 TB
  * design claims: moment reduction independent of N, banded dedup linear
  * in docs, bucketed join exchange-free).
  *
  * Same measurement discipline as [[Bench]]: smoke-check + ANALYZE outside
  * the timings, a prebuild pass for the index-backed members (build is
  * ingest cost, not probe cost), one cold pass, two warm passes with the
  * per-query min reported (the quiet-host best-of policy Bench applies via
  * its resweeps). Query names come from SPARK_GRAFT_BENCH_ONLY
  * (comma-separated); default = the r10 sf0.1 top-15 by warm time plus the
  * three reference-mapping queries (dir-independent — their ratio ~1 is
  * the control row).
  */
object BenchSlope {
  private val DefaultSubset = Seq(
    // top-15 by warm time in bench_out/bench_sf0.1_r10.json
    "q133_index_append", "q111_stream_dedup", "q155_kv_store_admission",
    "q157_stream_sessionization", "q131_index_admission", "q136_index_merge",
    "q154_pca_eigen", "q139_temporal_neardup", "q102_substring_dedup",
    "q141_pca_moments", "q124_incremental_neardup", "q130_refresh_pipeline",
    "q35b_minhash_lsh", "q87_pagerank", "q76_fuzzy_decontam",
    // the three mapping queries (fixture-corpus, dir-independent control)
    "q41_claims_mapping", "q42_claim_services", "q43_claim_diagnoses")

  private val IndexBacked = Set("q50_ann_ivf", "q130_refresh_pipeline",
    "q131_index_admission", "q133_index_append", "q135_ivf_append",
    "q136_index_merge", "q155_kv_store_admission", "q156_ivf_pq")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names: Seq[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(DefaultSubset)
    val subset = SparkEntry.registry.filter(q => names.contains(q.name))
    val missing = names.filterNot(subset.map(_.name).contains)
    require(missing.isEmpty, s"unknown query names: ${missing.mkString(", ")}")

    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    Tables.smokeCheck(spark, sfDir)
    CatalogStats.analyze(spark, sfDir)
    Tables(spark, sfDir).lineitem.limit(1000)
      .write.format("noop").mode("overwrite").save()

    // A failed execution is recorded in `failed` and DROPPED from the
    // pass's timing dict — Bench's solo-pass rule ("a time-to-failure
    // must never read as a steady-state number in the artifact") applies
    // per-pass here too: a fast-failing query at one tier would
    // otherwise ledger as a bogus sublinear ratio (r10 ADVICE).
    val failed = collection.mutable.LinkedHashSet[String]()
    def pass(tag: String): Seq[(String, Double)] = subset.flatMap { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          failed += s"$tag:${q.name}"
          System.err.println(s"[slope:$tag] ${q.name} FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[slope:$tag] ${q.name}%-28s ${dt}%8.2f s" +
        (if (ok) "" else " (FAILED — dropped from dict)"))
      spark.catalog.clearCache()
      if (ok) Some(q.name -> dt) else None
    }

    // prebuild: one untimed execution of the index-backed members so the
    // cold pass measures the probe, not the per-(dir, JVM) artifact build
    subset.filter(q => IndexBacked.contains(q.name)).foreach { q =>
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[slope:prebuild] ${q.name} FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    val cold = pass("cold")
    val w1 = pass("warm").toMap
    val w2 = pass("warm2").toMap
    // best-of-2 over the passes that SUCCEEDED; a query that failed both
    // warm passes has no entry at all (slope_ledger.py surfaces it in
    // `dropped` instead of silently intersecting it away)
    val warm = subset.flatMap { q =>
      val vs = Seq(w1.get(q.name), w2.get(q.name)).flatten
      if (vs.isEmpty) None else Some(q.name -> vs.min)
    }

    spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
    spark.sparkContext.setLogLevel("OFF")
    try spark.stop() catch { case _: Throwable => () }

    def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def obj(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val failedArr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val out =
      s"""{"metric":"scale_slope","sf":"$sfDir","queries":${obj(warm)},""" +
        s""""cold_queries":${obj(cold)},"warm1":${obj(w1.toSeq.sortBy(_._1))},""" +
        s""""warm2":${obj(w2.toSeq.sortBy(_._1))},""" +
        s""""n_failed":${failed.size},"failed":$failedArr}"""
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      val path = java.nio.file.Paths.get(p)
      Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(path, out + "\n")
    }
    println(out)
    System.out.flush()
  }
}
