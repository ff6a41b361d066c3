package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtering exact set-similarity join (the AllPairs / PPJoin
  * candidate-generation family: Bayardo et al., WWW 2007; Xiao et al.,
  * WWW 2008 — public algorithms, re-expressed as Spark dataflow).
  *
  * Completes the near-dup battery (SURVEY.md §2.12 L2) with a third
  * physical strategy for the same logical operator as
  * [[Dedup.jaccardPairs]] / [[MinHashLSH.nearDuplicatePairs]]:
  *
  *  - exact all-pairs: exact result, O(n²) — oracle only.
  *  - MinHash-LSH: scalable, but recall < 1 by construction.
  *  - '''prefix filter (this)''': scalable AND exact. Under a global
  *    token order, any pair with Jaccard >= t must share at least one
  *    token within both documents' first `|d| - ceil(t*|d|) + 1` tokens
  *    (if all shared tokens sat outside a prefix, the suffix — which has
  *    only `ceil(t*|d|) - 1` slots — could not hold the >= ceil(t*|d|)
  *    tokens an overlap of Jaccard t requires). Joining ONLY on prefix
  *    tokens therefore generates a candidate superset, and the exact
  *    refine makes the final pair set identical to the all-pairs plan —
  *    no recall parameter to tune, no missed pairs.
  *
  * Scale shape: one groupBy computes document frequency per token
  * (vocabulary-sized, partial-aggregated); ordering tokens
  * rarest-first means prefixes are built from the LEAST frequent tokens,
  * so candidate buckets are naturally small — the hot boilerplate tokens
  * that explode LSH buckets land in suffixes and never generate
  * candidates. The pruning power is proportional to token selectivity:
  * on word n-grams (vocabulary growing with the corpus, df per gram
  * small) candidates are a vanishing fraction of the pair space, while
  * on a bounded alphabet (e.g. char 3-grams: <= ~18k distinct values no
  * matter the corpus) every prefix token is eventually hot and the
  * filter degenerates toward all-pairs — there LSH is the right scale
  * path. Measured on the fixture corpus: word-3-gram candidates are
  * <1% of the pair space; char-3-gram candidates are ~59% of it. The global order needs no global rank assignment (which
  * would be a single-partition window): any deterministic total order
  * works, so tokens sort directly by the (df, token) pair and the only
  * windows are per-document. Candidates then refine through
  * [[Dedup.jaccardForPairs]] (bitmap/inverted strategy, shared with the
  * LSH path).
  */
object PrefixFilterJoin {

  /** Candidate (da, db) pairs — a provable superset of all pairs with
    * Jaccard >= threshold over the shingle sets, possibly with
    * duplicates (one row per shared prefix token). Input: distinct
    * (doc_id, s) rows as produced by [[Dedup.charShingles]].
    */
  def candidatePairs(shingles: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1] required, got $threshold")
    // document frequency per token: the global-order key. Vocabulary-sized
    // dim (sublinear in corpus), equi-joined back on the token.
    val df = shingles.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    // fp guard: ceil(t*n) computed in doubles may land one above the true
    // rational (t*n = k exactly, fp k+δ), shrinking the prefix below the
    // provable bound and silently dropping pairs — back off by an epsilon
    // smaller than any representable t*n step at realistic set sizes
    val need = ceil(lit(threshold) * col("n") - lit(1e-9))
    val prefix = shingles
      .join(df, Seq("s"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("pos", row_number().over(byDoc))
      .filter(col("pos") <= col("n") - need + 1)
      .select(col("doc_id"), col("s"), col("n"))
    val a = prefix.select(col("doc_id").as("da"), col("s"), col("n").as("na"))
    val b = prefix.select(col("doc_id").as("db"), col("s"), col("n").as("nb"))
    // size filter: J >= t forces t*max(na,nb) <= min(na,nb); same epsilon
    // in the safe (superset-preserving) direction
    a.join(b, Seq("s"))
      .filter(col("da") < col("db") &&
        least(col("na"), col("nb")).cast("double") >=
          lit(threshold) * greatest(col("na"), col("nb")) - lit(1e-9))
      .select(col("da"), col("db"))
  }

  /** Exact near-dup pairs (da < db, jaccard >= threshold) — identical
    * result to the all-pairs plan, at prefix-join cost. */
  def nearDuplicatePairs(shingles: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles.cache()
    val out = Dedup.jaccardForPairs(
      sh, candidatePairs(sh, threshold), threshold, pairsDistinct = false)
    out
  }
}
