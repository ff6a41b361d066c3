package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-regression guard: PLANS.md documents the physical-plan properties
  * the headline queries are designed around, but a dump can't fail a
  * build. This spec asserts those invariants on the live plans at
  * sf0.001 cost, so a regression (a filter that stops pushing down, a
  * dim join that stops broadcasting, a stray shuffle in the mapping, a
  * CartesianProduct sneaking into an LSH path) fails CI instead of
  * waiting for a bench diff.
  */
class PlanGuardSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val q = SparkEntry.registry.find(_.name == name)
      .getOrElse(fail(s"no registry entry named $name"))
    val plan = q.run(spark, sfDir).queryExecution.explainString(FormattedMode)
    spark.catalog.clearCache() // same hygiene contract as Bench/Verify
    plan
  }

  test("q01: filters reach the parquet scan as PushedFilters") {
    val plan = planOf("q01_filter_scan")
    assert(plan.contains("PushedFilters: ["), s"no pushdown section in:\n$plan")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"PushedFilters list is empty:\n$plan")
  }

  test("q03: aggregation is partial (map-side combine) before the exchange") {
    val plan = planOf("q03_groupby_agg")
    // formatted-mode detail sections are "(N) Operator" with ids numbered
    // bottom-up: the partial HashAggregate must carry a SMALLER id than
    // every Exchange (i.e. sit below the shuffle), not merely exist
    val secRe = """(?s)\((\d+)\) (\w+)(.*?)(?=\n\(\d+\) |\z)""".r
    val secs = secRe.findAllMatchIn(plan)
      .map(m => (m.group(1).toInt, m.group(2), m.group(3))).toSeq
    val partialIds = secs.collect {
      case (id, "HashAggregate", body) if body.contains("partial_") => id
    }
    val exchangeIds = secs.collect { case (id, "Exchange", _) => id }
    assert(partialIds.nonEmpty, s"no partial HashAggregate section in:\n$plan")
    assert(exchangeIds.nonEmpty, s"no Exchange section in:\n$plan")
    assert(partialIds.min < exchangeIds.min,
      s"partial agg (ids $partialIds) must sit below the first exchange (ids $exchangeIds)")
  }

  test("q07: dimension joins broadcast, and nothing degenerates to a cartesian product") {
    val plan = planOf("q07_star_join")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
  }

  test("q41: the 837 mapping is shuffle-free until its final ORDER BY") {
    val plan = planOf("q41_claims_mapping")
    val exchanges = "Exchange (hash|range|single)partitioning".r.findAllIn(plan).toList
    assert(exchanges.size <= 1,
      s"expected at most the ORDER BY range exchange, found $exchanges in:\n$plan")
    exchanges.foreach(e => assert(e.contains("rangepartitioning"),
      s"unexpected non-ORDER-BY shuffle: $e"))
  }

  test("q35b: the LSH pipeline never plans a cartesian product") {
    val plan = planOf("q35b_minhash_lsh")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in the LSH refine path:\n$plan")
  }

  test("q74: the quota frame broadcasts into the rank-filtered corpus") {
    val plan = planOf("q74_domain_mixture")
    assert(plan.contains("BroadcastHashJoin"),
      s"quota join must broadcast the metadata-scale quota frame:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
  }

  test("q76: bipartite decontamination broadcasts the eval side, no cartesian") {
    val plan = planOf("q76_fuzzy_decontam")
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-side banded frame must broadcast into the train stream:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
  }

  test("q83: the prefix join is all equi-joins — no cartesian, no nested loop") {
    val plan = planOf("q83_prefix_join")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in the prefix-filter path:\n$plan")
  }

  test("q84: chunking is shuffle-free until its final ORDER BY") {
    val plan = planOf("q84_chunking")
    val exchanges = "Exchange (hash|range|single)partitioning".r.findAllIn(plan).toList
    assert(exchanges.size <= 1,
      s"expected at most the ORDER BY range exchange, found $exchanges in:\n$plan")
    exchanges.foreach(e => assert(e.contains("rangepartitioning"),
      s"unexpected non-ORDER-BY shuffle: $e"))
    assert(plan.contains("PushedFilters: ["), s"doc_id filter must push down:\n$plan")
  }

  test("q85: projection is row-local — no joins, no shuffle before the ORDER BY") {
    val plan = planOf("q85_random_projection")
    assert(!plan.contains("Join"), s"the sign matrix must fold into literals, not a join:\n$plan")
    val exchanges = "Exchange (hash|range|single)partitioning".r.findAllIn(plan).toList
    assert(exchanges.size <= 1 && exchanges.forall(_.contains("rangepartitioning")),
      s"unexpected shuffle in the row-local projection: $exchanges")
  }

  test("q89: the boilerplate set broadcasts back into the line stream") {
    val plan = planOf("q89_line_dedup")
    // the >= minDocs filter shrinks the frequency table to metadata scale;
    // AQE must turn the join back into a broadcast, not a shuffle join
    assert(plan.contains("BroadcastHashJoin") || plan.contains("broadcast"),
      s"boilerplate join should broadcast the filtered side:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
  }

  test("q90: NFC normalization is row-local and stays in codegen") {
    val plan = planOf("q90_unicode_nfc")
    val exchanges = "Exchange (hash|range|single)partitioning".r.findAllIn(plan).toList
    assert(exchanges.size <= 1 && exchanges.forall(_.contains("rangepartitioning")),
      s"unexpected shuffle in a row-local map: $exchanges")
    // codegen capability is asserted structurally: the expression must not
    // be a CodegenFallback (formatted AQE plans don't print codegen spans)
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val expr = org.apache.spark.sql.graft.NormalizeUnicode(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFC")
    assert(!expr.isInstanceOf[CodegenFallback],
      "NormalizeUnicode must implement doGenCode, not fall back")
  }

  test("q91: weighted sampling plans as top-k, not a global sort") {
    val plan = planOf("q91_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      s"orderBy+limit must plan as TakeOrderedAndProject:\n$plan")
    assert(!"Exchange rangepartitioning".r.findFirstIn(plan).isDefined,
      s"global range sort in the sampling path:\n$plan")
  }

  test("q96: classifier scoring is row-local — no joins, no shuffle before the ORDER BY") {
    val plan = planOf("q96_quality_classifier")
    assert(!plan.contains("Join"), s"classifier scoring must not join:\n$plan")
    val exchanges = "Exchange (hash|range|single)partitioning".r.findAllIn(plan).toList
    assert(exchanges.size <= 1 && exchanges.forall(_.contains("rangepartitioning")),
      s"unexpected shuffle in the row-local scoring path: $exchanges")
  }

  test("q97: the salted cap never plans a cartesian product; kept-flag join broadcasts") {
    val plan = planOf("q97_domain_caps")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    // the pass-2 survivor set is <= cap * nSalts rows per domain —
    // metadata scale — so the audit join back must broadcast it
    assert(plan.contains("BroadcastHashJoin"),
      s"kept-flag audit join should broadcast the capped survivor set:\n$plan")
  }

  test("q98: hard negatives broadcast the probe side; the candidate scan is one pass") {
    val plan = planOf("q98_hard_negatives")
    // the label predicate is non-equi by design, so the join is a
    // nested-loop over a TINY broadcast probe set — what must NOT happen
    // is a cartesian (neither side broadcast) or a shuffle of the
    // candidate stream before the band filter
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"probes must broadcast into the candidate scan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
  }

  test("q102: the window-frequency pipeline shuffles 8-byte hash keys, no cartesian") {
    val plan = planOf("q102_substring_dedup")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    // the frequency aggregate must be partial (map-side combine) before
    // its exchange — the explode multiplies rows, so this is the one
    // place map-side reduction pays most
    assert(plan.contains("partial_count"), s"no partial aggregation in:\n$plan")
  }

  test("q104: filter attribution is one narrow projection + one global aggregate") {
    val plan = planOf("q104_filter_attribution")
    assert(!plan.contains("Join"), s"row-local predicates must not join:\n$plan")
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(plan).toList
    assert(exchanges.isEmpty,
      s"a global agg needs only the single-partition exchange, found: $exchanges")
  }

  test("CBO: the q07 star join reorders under ANALYZE stats (SURVEY §4.2)") {
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    def t(name: String) = CatalogStats.catalogName(sfDir, name)
    // the q07 shape spelled in the WORST syntactic order for a cost-blind
    // left-deep plan: the fact table joins first, so every intermediate
    // carries |orders| rows; with stats the optimizer should build the
    // dimension chain first and join orders last
    val sql =
      s"""SELECT r_name, n_name, count(*) AS n
         |FROM ${t("orders")}
         |JOIN ${t("customer")} ON o_custkey = c_custkey
         |JOIN ${t("nation")} ON c_nationkey = n_nationkey
         |JOIN ${t("region")} ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin
    def leafOrder(p: LogicalPlan): Seq[String] =
      p.collectLeaves().map(_.toString).map { s =>
        Seq("orders", "customer", "nation", "region").find(n => s.contains(t(n)))
          .getOrElse("?")
      }
    // the shared session must come back exactly as found: confs restored
    // to their prior values and the graft_* registration dropped, so
    // other guards' plans can't depend on test execution order
    val priorCbo = spark.conf.getOption("spark.sql.cbo.enabled")
    val priorReorder = spark.conf.getOption("spark.sql.cbo.joinReorder.enabled")
    CatalogStats.analyze(spark, sfDir) // registers + ANALYZE, flips CBO on
    try {
      // stats actually landed: rowCount visible on the optimized scan
      val rc = spark.table(t("orders")).queryExecution.optimizedPlan.stats.rowCount
      assert(rc.exists(_.toLong > 0L), s"ANALYZE left no rowCount: $rc")
      val withCbo = leafOrder(spark.sql(sql).queryExecution.optimizedPlan)
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val noCbo = leafOrder(spark.sql(sql).queryExecution.optimizedPlan)
      assert(noCbo.head == "orders", s"cost-blind plan should keep syntactic order: $noCbo")
      assert(withCbo != noCbo,
        s"stats did not change the join order: cbo=$withCbo nocbo=$noCbo")
      assert(withCbo.head != "orders",
        s"the fact table should no longer anchor the join chain: $withCbo")
      // the harness runs EVERY query in this context (catalog stats +
      // CBO), so the headline invariants must hold here too, not only in
      // the stat-less default the other guards assert. q139 is the
      // regression this guard exists for: CBO join-reorder once picked
      // the |ta-tb| <= horizon THETA edge first and planned the
      // timestamp attach as a corpus x corpus BroadcastNestedLoopJoin
      // (r10's "23x superlinear" ledger row; fixed by refining before
      // the hit-scale timestamp joins — MinHashLSH scaladoc).
      Seq("q07_star_join", "q35b_minhash_lsh", "q76_fuzzy_decontam",
          "q139_temporal_neardup").foreach { name =>
        val q = SparkEntry.registry.find(_.name == name).get
        val plan = q.run(spark, sfDir).queryExecution.explainString(FormattedMode)
        spark.catalog.clearCache()
        assert(!plan.contains("CartesianProduct"),
          s"$name degenerates to a cartesian under CBO stats:\n$plan")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join under CBO stats:\n$plan")
        if (name == "q07_star_join")
          assert(plan.contains("BroadcastHashJoin"),
            s"dims stop broadcasting under CBO stats:\n$plan")
      }
    } finally {
      def restore(key: String, prior: Option[String]): Unit = prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      restore("spark.sql.cbo.enabled", priorCbo)
      restore("spark.sql.cbo.joinReorder.enabled", priorReorder)
      CatalogStats.reset(spark)
    }
  }

  test("q78: the ORC read-back scan prunes to the projected columns") {
    val plan = planOf("q78_orc_roundtrip")
    val read = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
      .map(_.group(1)).toList
    assert(read.nonEmpty, s"no ReadSchema in:\n$plan")
    // the aggregate consumes 3 of supplier's 4 columns; the ORC scan must
    // read those and NOT the unprojected one (name-based, so a type with
    // commas — decimal(12,2) — can't break the check)
    val orcSchema = read.find(s => s.contains("s_suppkey")).getOrElse(
      fail(s"no supplier ReadSchema in:\n$plan"))
    Seq("s_suppkey", "s_acctbal", "s_name").foreach(c =>
      assert(orcSchema.contains(c), s"projected column $c missing from: $orcSchema"))
    assert(!orcSchema.contains("s_nationkey"),
      s"ORC scan reads the unprojected column: $orcSchema")
  }

  test("q120: the tf diamond reads the cached frame, not the source twice") {
    val plan = planOf("q120_tfidf_keywords")
    // without the tf cache, the scored join and the df derivation each
    // re-run tokenize + the token-stream shuffle: TWO numbered parquet
    // scans and no cache node. With it, both branches read the
    // InMemoryRelation, whose cached-plan printout contributes the one
    // remaining numbered scan section.
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).size
    assert(plan.contains("InMemoryRelation"), s"tf frame is not cached in:\n$plan")
    assert(scans <= 1, s"tf diamond re-scans the source ($scans scans) in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
  }

  test("q122: the interleave scan prunes to doc_id/source/n_chars") {
    val plan = planOf("q122_curriculum_interleave")
    val read = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
      .map(_.group(1)).toList
    assert(read.nonEmpty, s"no ReadSchema in:\n$plan")
    read.foreach { s =>
      assert(!s.contains("text"),
        s"interleave drags text through the rank shuffle: $s")
    }
  }

  test("q124: batch admission broadcasts the batch side, no cartesian") {
    val plan = planOf("q124_incremental_neardup")
    assert(plan.contains("BroadcastHashJoin"),
      s"batch-side banded frame must broadcast into the corpus stream:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
  }

  test("q153: the fact scan carries a dynamicpruning partition filter") {
    // the dim side (top-3 urgent months) is runtime-derived, so the
    // month-partitioned fact scan must be pruned by a DPP subquery —
    // not a constant partition filter, and never a full scan
    val plan = planOf("q153_dynamic_partition_pruning")
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$plan")
    assert(plan.contains("PartitionFilters"),
      s"no partition filter section on the fact scan:\n$plan")
  }

  test("skewed vocabulary join: AQE's skew split fires (skew=true in the final adaptive plan)") {
    // the q120 shape — per-token tf rows joined to a vocabulary-sized df
    // side that is deliberately NOT broadcast (corpus vocabularies exceed
    // any broadcast cap), with stopword skew left to AQE. This guard
    // proves the runtime half of that design decision: a hot key's
    // shuffle partition past the skew threshold is SPLIT, not serialized
    // onto one reducer. Thresholds lowered to spec scale; the skewed
    // SortMergeJoin prints skew=true only in the FINAL adaptive plan,
    // i.e. after execution.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "262144",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 100
      // 90% of 200k tf rows land on the stopword key — one hot shuffle
      // partition ~20 MB raw vs a few hundred KB for the cold tokens
      val tf = spark.range(0, 200000).select(
        when($"id" % 10 < 9, lit("the"))
          .otherwise(concat(lit("tok"), ($"id" % 1000).cast("string"))).as("term"),
        concat(lit(pad), $"id".cast("string")).as("payload"))
      val df = spark.range(0, 1000)
        .select(concat(lit("tok"), $"id".cast("string")).as("term"),
          ($"id" + 1).cast("double").as("df"))
        .union(Seq(("the", 1.0)).toDF("term", "df"))
      val joined = tf.join(df, Seq("term"))
      // drive the df's OWN query execution to finality (count()/write
      // would plan a separate execution whose adaptive plan we can't see)
      val n = joined.queryExecution.executedPlan.execute().count()
      assert(n == 200000L, s"join lost rows: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
