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
    * `broadcastNodeCap`: the rank frame and the per-round contribution
    * frame are both exactly one row per node; when the node count is at
    * or under the cap they get explicit broadcast hints, making each
    * round a map-side join + ONE shuffle (the contribution sum) + a
    * map-side apply — instead of three shuffle joins. Checkpointed rank
    * frames carry no catalog statistics, so without the hint AQE can't
    * discover this on its own. Above the cap (a genuinely large graph)
    * every join stays key-partitioned — the same adaptive-switch idiom
    * as `Dedup.jaccardPairs`.
    */
  def ranks(
      edges: DataFrame, iterations: Int = 10, alpha: Double = 0.85,
      checkpointDir: Option[String] = None,
      broadcastNodeCap: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    // loop-invariant: out-degree-weighted edges, one shuffle, cached
    // across all rounds. Cache-release contract: see Dedup.jaccardPairs.
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val weighted = edges.join(deg, Seq("src")).cache()
    val nodes = edges.select(col("src").as("v")).distinct().cache()
    val n = nodes.count()
    require(n > 0, "PageRank over an empty edge list")
    def hint(df: DataFrame): DataFrame =
      if (n <= broadcastNodeCap) broadcast(df) else df
    val teleport = (1.0 - alpha) / n
    var r = materialize(nodes.withColumn("r", lit(1.0 / n)))
    for (_ <- 1 to iterations) {
      val contrib = weighted.join(hint(r), weighted("src") === r("v"))
        .select(col("dst"), (col("r") / col("__d")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_r"))
      // materialize every round: deferring it makes the next round's
      // broadcast build re-execute the whole unmaterialized chain —
      // measured no cheaper and the lineage contract gets murkier
      r = materialize(nodes
        .join(hint(contrib), nodes("v") === contrib("dst"), "left")
        .select(col("v"),
          (lit(teleport) + lit(alpha) * coalesce(col("in_r"), lit(0.0))).as("r")))
    }
    r
  }
}
