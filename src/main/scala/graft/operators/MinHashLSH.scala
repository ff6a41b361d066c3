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

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private[operators] val Prime = 2147483647L // 2^31 - 1, Mersenne

  /** Per-(band, key) bucket size above which the all-pairs self-join is
    * replaced by a star through the bucket's min-doc representative. A
    * pathological corpus (thousands of boilerplate-identical documents)
    * puts K docs in one bucket and K^2 candidate rows into the refine —
    * the one shape banding doesn't bound. In practice oversized buckets
    * are boilerplate-identical groups, but a band collision is
    * probabilistic, NOT a similarity guarantee: star-linking (K-1
    * pairs, each still exactly refined) preserves dup-GROUP
    * connectivity for clustering while reducing pairwise recall inside
    * the hot bucket — two docs whose only shared band is an over-cap
    * bucket are only reached through the representative. Set the cap to
    * Int.MaxValue where unconditional recall matters more than bounded
    * cost.
    *
    * `SPARK_GRAFT_BUCKET_CAP` overrides the default for a whole JVM —
    * the scale-tier gate runs use it to hash-compare the uncapped pair
    * sets against the (cap-blind) SQL oracles at tiers where a hot
    * bucket crosses 1024, while cap ENGAGEMENT itself is exercised by
    * ScaleSmoke and the hot-bucket specs at the default.
    */
  val DefaultBucketCap: Int =
    sys.env.get("SPARK_GRAFT_BUCKET_CAP").map(_.toInt).getOrElse(1024)

  /** Candidate pairs from banded rows (doc_id, band, bkey) with the
    * hot-bucket cap applied. Bucket statistics ride a window over the
    * same (band, bkey) shuffle the self-join needs; buckets over `cap`
    * are star-joined, the rest all-pairs'd bucket-locally. Shared by
    * MinHash banding and SimHash pigeonhole banding.
    *
    * `logOverflow` (default true) counts and warns about capped buckets
    * — an EAGER statistic: it executes the banding pipeline into the
    * cache at call time (the downstream joins then reuse it). Callers
    * composing a plan for later execution should pass false to stay
    * lazy.
    *
    * `cache` (default true) pins the annotated banding for the
    * multiple reads below, released by the harness-wide clearCache
    * contract (see Dedup.jaccardPairs). Long-lived callers that invoke
    * this per micro-batch (DedupStreams) pass false — an accumulating
    * per-trigger cache entry would pin storage memory for the life of
    * the stream — and rely on caching `banded` themselves plus
    * ReuseExchange folding the repeated window scans within the one
    * consuming action.
    */
  private[graft] def cappedBucketPairs(
      banded: DataFrame, cap: Int, logOverflow: Boolean = true,
      dedup: Boolean = true, cache: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("band"), col("bkey"))
    // cached: the small-bucket self-join reads this twice and the
    // overflow branch + its logging statistic once more. Cache-release
    // contract: see Dedup.jaccardPairs.
    val annotated = banded
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__rep", min(col("doc_id")).over(w))
    val ann = if (cache) annotated.cache() else annotated
    val overflow = ann.filter(col("__cnt") > cap)
    if (logOverflow) {
      val overflowBuckets = overflow.select(col("band"), col("bkey")).distinct().count()
      if (overflowBuckets > 0)
        log.warn(s"capped $overflowBuckets hot LSH bucket(s) exceeding $cap docs: " +
          "emitting representative-star pairs instead of all-pairs for those buckets")
    }
    val small = ann.filter(col("__cnt") <= cap)
    val a = small.select(col("band"), col("bkey"), col("doc_id").as("da"))
    val b = small.select(col("band"), col("bkey"), col("doc_id").as("db"))
    val smallPairs = a.join(b, Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"))
    val starPairs = overflow.filter(col("doc_id") =!= col("__rep"))
      .select(col("__rep").as("da"), col("doc_id").as("db"))
    val union = smallPairs.union(starPairs)
    // dedup=false skips the cross-band distinct — a full shuffle of the
    // candidate set — for consumers that dedup after a cheap per-row
    // refine instead (see Dedup.jaccardForPairs pairsDistinct=false)
    if (dedup) union.distinct() else union
  }

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

  /** Distinct candidate pairs (da < db) from banded signatures, hot
    * buckets capped at `bucketCap` (see [[cappedBucketPairs]], including
    * the eager-statistic note on `logOverflow`).
    */
  def candidatePairs(
      signatures: DataFrame, bands: Int = 32, rowsPerBand: Int = 4,
      bucketCap: Int = DefaultBucketCap, logOverflow: Boolean = true): DataFrame =
    bandedPairs(signatures, bands, rowsPerBand, bucketCap, logOverflow, dedup = true)

  /** As [[candidatePairs]] but WITHOUT the final distinct — one pair row
    * per matching (band, bucket), duplicates included. The refine dedups
    * after thresholding, which is cheaper than shuffling the full
    * candidate multiset when the per-pair refine is a broadcast-kernel
    * popcount.
    */
  private[operators] def candidatePairsRaw(
      signatures: DataFrame, bands: Int = 32, rowsPerBand: Int = 4,
      bucketCap: Int = DefaultBucketCap): DataFrame =
    bandedPairs(signatures, bands, rowsPerBand, bucketCap, logOverflow = true, dedup = false)

  /** Adds (band, bkey) rows to a signature frame — one row per band,
    * all other columns carried through. THE band-key definition: every
    * consumer (batch candidate generation, the streaming index join)
    * must derive keys through here so they can never drift apart.
    */
  /** Guard for every (numPerms, bands, rowsPerBand) entry point: an
    * over-long banding slices past the signature — the trailing bands
    * hash empty slices, EVERY document collides in them, and candidate
    * generation silently degenerates to per-band all-pairs.
    */
  private[graft] def requireBandsFit(numPerms: Int, bands: Int, rowsPerBand: Int): Unit =
    require(bands * rowsPerBand <= numPerms,
      s"bands ($bands) x rowsPerBand ($rowsPerBand) exceeds the $numPerms-perm signature")

  private[graft] def bandKeys(
      signatures: DataFrame, bands: Int = 32, rowsPerBand: Int = 4): DataFrame =
    signatures.select(
      col("*"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bkey")

  private def bandedPairs(
      signatures: DataFrame, bands: Int, rowsPerBand: Int,
      bucketCap: Int, logOverflow: Boolean, dedup: Boolean): DataFrame = {
    val banded = bandKeys(signatures, bands, rowsPerBand)
      .select(col("doc_id"), col("band"), col("bkey"))
    cappedBucketPairs(banded, bucketCap, logOverflow, dedup)
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
    requireBandsFit(numPerms, bands, rowsPerBand)
    // The pipeline scans the shingle set several times (signature agg, the
    // dictionary statistic, the refine join) — cache the exploded form once
    // rather than re-deriving it from the source per action.
    // Cache-release contract: see Dedup.jaccardPairs.
    val sh = shingles.cache()
    // raw (duplicated) candidates: the refine dedups AFTER thresholding,
    // trading cheap repeated popcounts for the full candidate-multiset
    // distinct shuffle
    val cand = candidatePairsRaw(signatures(sh, numPerms), bands, rowsPerBand)
    Dedup.jaccardForPairs(sh, cand, threshold, pairsDistinct = false)
  }

  /** Horizon-scoped near-dup pairs: like [[nearDuplicatePairs]], but a
    * pair only counts when the two documents' timestamps lie within
    * `horizon` of each other — the "don't compare January against a
    * three-year-old crawl" shape of rolling-corpus dedup.
    *
    * WHY a dedicated operator instead of
    * `nearDuplicatePairs(..).filter(gap <= horizon)`: the post-filter
    * spelling still pays candidate generation over the FULL corpus —
    * every LSH bucket holds every epoch that ever hashed into it, so
    * bucket sizes (and the refine's pair count) grow with corpus AGE,
    * not with the horizon. Here the band key is extended with a coarse
    * time cell of width `horizon` and each signature row is replicated
    * into its own cell and the next one, so two docs can share a
    * bucket only when their cells are equal or adjacent — and any pair
    * within `horizon` IS within one cell of each other (floor
    * monotonicity), so recall vs the post-filter spelling is
    * unchanged. Bucket population is bounded by ~2·horizon of data per
    * key regardless of how old the corpus grows, which is the whole
    * point at 100 TB. The EXACT |ta-tb| <= horizon predicate (adjacent
    * cells admit gaps up to 2·horizon) is applied AFTER the Jaccard
    * refine, on hit-scale rows: refining the few out-of-window
    * candidates costs popcounts, while attaching timestamps to the
    * candidate MULTISET costs two candidate-scale joins — and, worse,
    * the pre-refine {cand, ta, tb, |ta-tb|<=h} join tree is exactly
    * the triangle CBO join-reorder mis-planned into a corpus x corpus
    * nested loop (ta x tb on the theta edge first, measured 101 s vs
    * 18 s at the 50k-doc tier — the r10 slope ledger's "23x
    * superlinear" row). Post-refine, the join inputs are hit-scale and
    * the tree is barriered behind the refine kernel's aggregate, so
    * neither cost nor reorder can touch corpus scale.
    *
    * `ts` must be a narrow (idCol, tCol) frame, one row per document —
    * fingerprint-scale, joined once onto the signature frame (not the
    * shingle explosion). Returns (da, db, jaccard, t_gap) with
    * jaccard >= threshold and t_gap <= horizon.
    */
  def temporalNearDuplicatePairs(
      shingles: DataFrame,
      ts: DataFrame,
      horizon: Long,
      threshold: Double,
      idCol: String = "doc_id",
      tCol: String = "t",
      numPerms: Int = 128,
      bands: Int = 32,
      rowsPerBand: Int = 4): DataFrame = {
    requireBandsFit(numPerms, bands, rowsPerBand)
    require(horizon > 0, s"horizon must be positive, got $horizon")
    // Cache-release contract: see Dedup.jaccardPairs.
    val sh = shingles.cache()
    val tsn = ts.select(col(idCol).as("doc_id"), col(tCol).cast("long").as("__t"))
    // floor division (not Spark's truncate-toward-zero `/` on longs) so
    // negative timestamps cell correctly; |t| < 2^52 keeps the double
    // path exact
    val cell = floor(col("__t").cast("double") / horizon.toDouble).cast("long")
    val banded = bandKeys(signatures(sh, numPerms).join(tsn, "doc_id"),
        bands, rowsPerBand)
      .withColumn("__cell", explode(array(cell, cell + lit(1L))))
      .select(col("doc_id"), col("band"),
        // fold the cell into the bucket key: the hot-bucket cap then
        // bounds per-(band, key, cell) work, exactly the bound that
        // holds at scale
        xxhash64(col("bkey"), col("__cell")).as("bkey"))
    // dedup=false: same-cell pairs meet in BOTH replicated cells (and
    // possibly several bands); the refine dedups after thresholding,
    // same trade as nearDuplicatePairs
    val cand = cappedBucketPairs(banded, DefaultBucketCap, logOverflow = true,
      dedup = false)
    val ta = tsn.select(col("doc_id").as("da"), col("__t").as("__ta"))
    val tb = tsn.select(col("doc_id").as("db"), col("__t").as("__tb"))
    // refine FIRST; the horizon predicate rides the hit-scale timestamp
    // attach below (see scaladoc: the pre-refine spelling was both a
    // candidate-scale double join and a CBO reorder hazard)
    Dedup.jaccardForPairs(sh, cand, threshold, pairsDistinct = false)
      .join(ta, "da").join(tb, "db")
      .withColumn("t_gap", abs(col("__ta") - col("__tb")))
      .filter(col("t_gap") <= horizon)
      .drop("__ta", "__tb")
  }
}
