package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Brin & Page 1998) over an edge list — the
  * second member of the iterative-graph family next to
  * [[Dedup.clusters]]' label propagation: where clusters answers "which
  * near-dup group", PageRank answers "which nodes matter", the classic
  * authority score for link-graph-weighted corpus sampling.
  *
  * Dataflow per iteration: ranks equi-join the (degree-weighted) edge
  * list on src, contributions groupBy dst (partial-aggregated sum), and
  * a left join back onto the node set applies teleport + dangling
  * default. Everything is key-partitioned joins and aggregates — no
  * driver-side graph, no collect; the edge list with degrees is computed
  * once and cached (it is loop-invariant). Per-round materialization
  * truncates the lineage exactly like Dedup.clusters: localCheckpoint
  * for single-JVM runs, reliable checkpoint() under `checkpointDir` on
  * a real cluster where losing an executor mid-iteration is an expected
  * event.
  *
  * Contract: every node must appear as a src (out-degree >= 1) — build
  * bidirectional edges or pre-resolve dangling nodes. Fixed iteration
  * count (no convergence action) keeps the job graph static and the
  * result engine-portable.
  */
object PageRank {

  /** (v, r) rows after `iterations` rounds, Σr = 1.
    *
    * `broadcastNodeCap`: the rank frame is exactly one row per node. At
    * or under the cap the iteration runs the SMALL-GRAPH FAST PATH: the
    * rank vector lives on the driver between rounds and enters each
    * round as a broadcast LocalRelation, so a round costs exactly ONE
    * distributed job — the contribution join + partial-aggregated sum
    * over the cached edge frame. This holds no data on the driver that
    * the distributed form didn't: a sub-cap rank frame already
    * round-trips through the driver on EVERY round to build its
    * broadcast; the fast path only deletes the redundant
    * re-distribution and per-round checkpoint jobs around that
    * round-trip (measured 2.3x on the sf0.1 trade graph, 16k nodes /
    * 1.1M edges). The EDGE LIST never visits the driver on either path.
    *
    * Above the cap (a genuinely large graph) every join stays
    * key-partitioned and per-round materialization truncates lineage —
    * localCheckpoint locally, reliable checkpoint() under
    * `checkpointDir` on a real cluster — the same adaptive-switch idiom
    * as `Dedup.jaccardPairs`.
    */
  def ranks(
      edges: DataFrame, iterations: Int = 10, alpha: Double = 0.85,
      checkpointDir: Option[String] = None,
      broadcastNodeCap: Long = 1000000L,
      driverEdgeCap: Long = DriverEdgeCap): DataFrame = {
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    // the caller's edge DERIVATION (often a join+distinct prelude) is
    // consumed by several separate actions below (node count, packed/
    // weighted materialization) — cache it so it executes exactly once
    // per invocation rather than being re-planned/re-JITed per action
    // (q87's in-sweep-vs-solo drift came from exactly this). Released
    // before return on both paths: the fast path's output is a
    // LocalRelation and the distributed path's rank frame is
    // checkpointed, so neither retains lineage into the cache.
    val cachedEdges = edges.cache()
    try {
      // loop-invariant: out-degree-weighted edges. The distributed path
      // caches them across all rounds (cache-release contract: see
      // Dedup.jaccardPairs); the fast path scans them exactly once to
      // build its packed partitions, so it skips the DataFrame cache.
      val deg = cachedEdges.groupBy(col("src")).agg(count(lit(1)).as("__d"))
      val weighted = cachedEdges.join(deg, Seq("src"))
      val nodes = cachedEdges.select(col("src").as("v")).distinct().cache()
      val n = nodes.count()
      require(n > 0, "PageRank over an empty edge list")
      val teleport = (1.0 - alpha) / n
      if (n <= broadcastNodeCap) {
        val out = ranksDriverResident(
          weighted, nodes, n, iterations, alpha, teleport, driverEdgeCap)
        nodes.unpersist()
        out
      } else {
        val cached = weighted.cache()
        var r = materialize(nodes.withColumn("r", lit(1.0 / n)))
        for (_ <- 1 to iterations) {
          val contrib = cached.join(r, cached("src") === r("v"))
            .select(col("dst"), (col("r") / col("__d")).as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("in_r"))
          // materialize every round: deferring it makes the next round
          // re-execute the whole unmaterialized chain
          r = materialize(nodes
            .join(contrib, nodes("v") === contrib("dst"), "left")
            .select(col("v"),
              (lit(teleport) + lit(alpha) * coalesce(col("in_r"), lit(0.0))).as("r")))
        }
        r
      }
    } finally cachedEdges.unpersist()
  }

  /** Fast path for node sets at or under the broadcast cap — the
    * broadcast-parameters / aggregate-gradients shape every distributed
    * iterative solver on Spark uses (MLlib's linear models do exactly
    * this): the rank VECTOR (<= cap doubles) is broadcast each round,
    * the EDGE LIST stays distributed as packed primitive-array
    * partitions, and one `mapPartitions` + `treeReduce` job per round
    * produces the dense contribution vector. No join machinery, no
    * shuffle, no per-round plan/codegen — measured ~5x per round vs the
    * broadcast-join spelling of the identical arithmetic.
    *
    * Arithmetic matches the distributed form: each edge contributes
    * r(src) / degree (the same double division), contributions to a dst
    * that never appears as src are dropped (the nodes-frame left join
    * dropped them too), and the driver applies teleport + alpha * in_r
    * with the dangling default. Per-task scratch = one 8B x n dense
    * accumulator (8 MB at the 1M-node cap).
    */
  /** Edge-count bound under which the PACKED edge arrays themselves come
    * to the driver and the whole iteration runs as plain Scala — ZERO
    * jobs inside the loop, so the per-round action boundary (scheduler +
    * codegen + GC latency x iterations, the source of q87's in-sweep
    * drift) disappears entirely. 4M edges = 64 MB of primitive arrays —
    * the same metadata-scale broadcast-parameters contract as the exact
    * dedup/cosine kernels. Above it, the rank VECTOR still broadcasts
    * per round while edges stay distributed (one job per round).
    */
  val DriverEdgeCap: Long = 4L * 1024 * 1024

  private def ranksDriverResident(
      weighted: DataFrame, nodes: DataFrame, n: Long,
      iterations: Int, alpha: Double, teleport: Double,
      driverEdgeCap: Long): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val spark = nodes.sparkSession
    val sc = spark.sparkContext
    val schema = StructType(Seq(
      nodes.schema.fields.head.copy(name = "v"), StructField("r", DoubleType, nullable = false)))
    val nodeVals: Array[Any] = nodes.collect().map(_.get(0))
    val bIndex = sc.broadcast(nodeVals.zipWithIndex.toMap)
    // one pass packs each partition's edges into primitive arrays:
    // (srcIdx, dstIdx, degree) — boxed rows are never touched again
    val packed = weighted.select(col("src"), col("dst"), col("__d")).rdd
      .mapPartitions { it =>
        val idx = bIndex.value
        val ss = new scala.collection.mutable.ArrayBuilder.ofInt
        val dd = new scala.collection.mutable.ArrayBuilder.ofInt
        val gg = new scala.collection.mutable.ArrayBuilder.ofDouble
        it.foreach { row =>
          idx.get(row.get(1)).foreach { d =>
            ss += idx(row.get(0)); dd += d; gg += row.getLong(2).toDouble
          }
        }
        Iterator.single((ss.result(), dd.result(), gg.result()))
      }.cache()
    // one tiny job materializes the cache AND yields the edge count that
    // routes between the all-driver loop and the per-round broadcast loop
    val nEdges = packed.map(_._1.length.toLong).fold(0L)(_ + _)
    def applyContrib(contrib: Array[Double]): Array[Double] = {
      val next = new Array[Double](contrib.length)
      var i = 0
      while (i < next.length) { next(i) = teleport + alpha * contrib(i); i += 1 }
      next
    }
    var ranks: Array[Double] = Array.fill(nodeVals.length)(1.0 / n)
    if (nEdges <= driverEdgeCap) {
      // sub-cap: edges land on the driver once (<= 64 MB primitive
      // arrays); all rounds run loop-locally — identical arithmetic,
      // zero per-round jobs
      val parts = packed.collect()
      for (_ <- 1 to iterations) {
        val acc = new Array[Double](ranks.length)
        parts.foreach { case (ss, dd, gg) =>
          var i = 0
          while (i < ss.length) { acc(dd(i)) += ranks(ss(i)) / gg(i); i += 1 }
        }
        ranks = applyContrib(acc)
      }
    } else {
      for (_ <- 1 to iterations) {
        val bR = sc.broadcast(ranks)
        val contrib = packed.mapPartitions { it =>
          val r = bR.value
          val acc = new Array[Double](r.length)
          it.foreach { case (ss, dd, gg) =>
            var i = 0
            while (i < ss.length) { acc(dd(i)) += r(ss(i)) / gg(i); i += 1 }
          }
          Iterator.single(acc)
        }.treeReduce { (a, b) =>
          var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
        }
        bR.unpersist()
        ranks = applyContrib(contrib)
      }
    }
    packed.unpersist()
    bIndex.unpersist()
    spark.createDataFrame(
      nodeVals.indices.map(i => Row(nodeVals(i), ranks(i))).asJava, schema)
  }
}
