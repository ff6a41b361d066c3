package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding for near-duplicate candidate generation
  * (SURVEY.md §2.12 L2; scheme per Broder 1997 / MMDS ch.3).
  *
  * Pipeline: shingles -> per-permutation min-hash signature -> band keys ->
  * bucket self-join -> distinct candidate pairs. The signature aggregation
  * is a single groupBy(doc_id) with `numPerms` min() columns — fully
  * partial-aggregatable, one shuffle. Band bucketing is a second shuffle on
  * the band key; bucket joins only touch same-bucket docs, which is the
  * whole point at 100 TB: candidate generation is linear in bucket sizes,
  * never all-pairs.
  *
  * Recall tuning: P(candidate | J) = 1 - (1 - J^rows)^bands. Defaults
  * (rows=4, bands=32) give P = 0.99985 at J = 0.7 while pruning ~99.6% of
  * the J~0.25 background pairs a self-similar token-soup corpus produces —
  * rows=2/bands=64 had total recall but degenerated to all-pairs candidate
  * sets on such corpora. Raise bands for recall, rows for selectivity.
  */
object MinHashLSH {

  private[operators] val Prime = 2147483647L // 2^31 - 1, Mersenne

  /** Universal-hash permutation parameters, fixed seeds => deterministic. */
  private def perms(numPerms: Int): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    Seq.fill(numPerms)((1 + rng.nextInt(Int.MaxValue - 1).toLong, rng.nextInt(Int.MaxValue).toLong))
  }

  /** Flattened (a0,b0,a1,b1,...) permutation params for the Aggregator. */
  private[operators] def permParams(numPerms: Int): Array[Long] =
    perms(numPerms).flatMap { case (a, b) => Seq(a, b) }.toArray

  /** (doc_id, sig: array<bigint>) — one row per doc, via the fused
    * MinHashAggregator (A8). `shingles` is (doc_id, s) as produced by
    * Dedup.charShingles. One shuffle, partial-agg on the map side.
    */
  def signatures(shingles: DataFrame, numPerms: Int = 128): DataFrame = {
    val h = pmod(xxhash64(col("s")), lit(Prime)) // base hash into [0, p)
    val mh = udaf(new MinHashAggregator(numPerms))
    shingles
      .select(col("doc_id"), h.as("h"))
      .groupBy(col("doc_id"))
      .agg(mh(col("h")).as("sig"))
  }

  /** The pure-expression formulation (numPerms separate min() columns) —
    * kept for cross-checking the Aggregator produces identical signatures.
    */
  private[operators] def signaturesExpr(shingles: DataFrame, numPerms: Int = 128): DataFrame = {
    val h = pmod(xxhash64(col("s")), lit(Prime))
    val minCols: Seq[Column] = perms(numPerms).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(h * a + b, lit(Prime))).as(s"m$i")
    }
    shingles
      .groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Distinct candidate pairs (da < db) from banded signatures. */
  def candidatePairs(signatures: DataFrame, bands: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    // cached: both sides of the bucket self-join read this (one signature
    // aggregation, not two). Cache-release contract: see
    // Dedup.jaccardPairs.
    val banded = signatures.select(
      col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
      .cache()
    val a = banded.select(col("band"), col("bkey"), col("doc_id").as("da"))
    val b = banded.select(col("band"), col("bkey"), col("doc_id").as("db"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"))
      .distinct()
  }

  /** End-to-end near-dup pairs: LSH candidates refined by exact Jaccard.
    * Returns (da, db, jaccard) with jaccard >= threshold.
    */
  def nearDuplicatePairs(
      shingles: DataFrame,
      threshold: Double,
      numPerms: Int = 128,
      bands: Int = 32,
      rowsPerBand: Int = 4): DataFrame = {
    // The pipeline scans the shingle set several times (signature agg, the
    // dictionary statistic, the refine join) — cache the exploded form once
    // rather than re-deriving it from the source per action.
    // Cache-release contract: see Dedup.jaccardPairs.
    val sh = shingles.cache()
    val cand = candidatePairs(signatures(sh, numPerms), bands, rowsPerBand)
    Dedup.jaccardForPairs(sh, cand, threshold)
  }
}
