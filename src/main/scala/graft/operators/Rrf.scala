package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
  * standard score-free way to combine retrieval lists from incomparable
  * scorers (lexical BM25 ranks and embedding-cosine ranks don't share a
  * scale; their RANKS do): each list contributes 1/(kRrf + rank) for the
  * items it ranked, and items are re-ordered by the summed contribution.
  *
  * Scale shape: the inputs are already top-k-per-query lists — |queries|
  * × k × |lists| rows, metadata-scale next to the corpus — so the fusion
  * itself is one map-side-combinable groupBy on (qid, id) plus a
  * per-query window. All the corpus-scale work stays in the retrieval
  * operators that produced the lists ([[Bm25.topK]],
  * [[SimilaritySearch.topK]], [[IvfIndex.topK]]).
  *
  * Determinism: contributions are the scaled integers
  * floor(1e12 / (kRrf + rank)) summed as BIGINT — exact arithmetic, so
  * fused order cannot drift with aggregation order or engine (the same
  * reason the vote scores in [[SimilaritySearch.knnClassify]] are
  * DECIMAL). Ties (same summed contribution) break by id ascending.
  */
object Rrf {

  /** Scale factor for the integer contributions. */
  val Scale: Long = 1000000000000L

  /** Fuse ranked lists, each with columns (qid, id, rank), rank 1-based
    * and (qid, id) unique within a list. Output: (qid, fused_rank, id,
    * rrf_scaled, n_lists) — top `k` ids per qid by summed scaled
    * contribution, ties by id.
    */
  def fuse(lists: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "fuse needs at least one ranked list")
    val contrib = lists
      .map(_.select(col("qid"), col("id"),
        // floor over the IEEE quotient: both the double division and the
        // floor are bit-identical everywhere this spelling runs (the
        // oracle uses the same text), and the result is exact BIGINT
        floor(lit(Scale.toDouble) / (lit(kRrf) + col("rank"))).cast("long").as("c")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy(col("qid"), col("id"))
      .agg(sum(col("c")).as("rrf_scaled"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_scaled").desc, col("id"))
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= k)
      .select(col("qid"), col("fused_rank"), col("id"), col("rrf_scaled"), col("n_lists"))
  }
}
