package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Dataflow (the canonical AllPairs shape): ONE aggregation builds each
  * document's gram array sorted rarest-first (global order = the
  * (document-frequency, token) pair, so no global rank assignment and
  * no single-partition window anywhere); the prefix is a `slice` of
  * that array; candidates come from a self-equi-join of the exploded
  * prefixes; and the refine joins the two gram arrays back by doc id
  * and intersects them row-locally (`array_intersect`) — the gram
  * stream is never re-shuffled after the one groupBy.
  *
  * The pruning power is proportional to token selectivity: on word
  * n-grams (vocabulary growing with the corpus, df per gram small)
  * candidates are a vanishing fraction of the pair space, while on a
  * bounded alphabet (e.g. char 3-grams: <= ~18k distinct values no
  * matter the corpus) every prefix token is eventually hot and the
  * filter degenerates toward all-pairs — there LSH is the right scale
  * path. Measured on the fixture corpus: word-3-gram candidates are
  * <1% of the pair space; char-3-gram candidates are ~59% of it.
  */
object PrefixFilterJoin {

  /** Per-doc rarest-first gram arrays: (doc_id, grams, n, prefix). */
  private def docGramArrays(shingles: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1] required, got $threshold")
    // document frequency per token: the global-order key. Vocabulary-sized
    // dim (sublinear in corpus), equi-joined back on the token.
    val df = shingles.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // fp guard: ceil(t*n) computed in doubles may land one above the true
    // rational (t*n = k exactly, fp k+δ), shrinking the prefix below the
    // provable bound and silently dropping pairs — back off by an epsilon
    // smaller than any representable t*n step at realistic set sizes
    val prefixLen = (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1).cast("int")
    shingles.join(df, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("gs"))
      .select(col("doc_id"),
        expr("transform(gs, g -> g.s)").as("grams"),
        size(col("gs")).as("n"))
      .withColumn("prefix", slice(col("grams"), lit(1), prefixLen))
  }

  /** Candidate (da, db) pairs — a provable superset of all pairs with
    * Jaccard >= threshold over the shingle sets, possibly with
    * duplicates (one row per shared prefix token). Input: distinct
    * (doc_id, s) rows as produced by [[Dedup.charShingles]].
    */
  def candidatePairs(shingles: DataFrame, threshold: Double): DataFrame =
    candidatesFrom(docGramArrays(shingles, threshold), threshold)

  private def candidatesFrom(d: DataFrame, threshold: Double): DataFrame = {
    val a = d.select(col("doc_id").as("da"), col("n").as("na"),
      posexplode(col("prefix")).as(Seq("pa", "s")))
    val b = d.select(col("doc_id").as("db"), col("n").as("nb"),
      posexplode(col("prefix")).as(Seq("pb", "s")))
    // size filter: J >= t forces t*max(na,nb) <= min(na,nb). Positional
    // filter (PPJoin): a shared token at 1-based positions (i, j) bounds
    // the overlap by 1 + min(na-i, nb-j); a TRUE pair's earliest shared
    // token is the pair's globally-minimal common token, whose bound is
    // >= the real overlap >= ceil(t/(1+t)*(na+nb)), so keeping a pair if
    // ANY of its shared-prefix-token rows passes preserves the superset
    // guarantee while pruning pairs that only share late prefix slots.
    // Epsilons in the safe (superset-preserving) direction throughout.
    val overlapNeed =
      lit(threshold / (1.0 + threshold)) * (col("na") + col("nb")) - lit(1e-9)
    a.join(b, Seq("s"))
      .filter(col("da") < col("db") &&
        least(col("na"), col("nb")).cast("double") >=
          lit(threshold) * greatest(col("na"), col("nb")) - lit(1e-9) &&
        (lit(1) + least(col("na") - (col("pa") + 1), col("nb") - (col("pb") + 1)))
          .cast("double") >= overlapNeed)
      .select(col("da"), col("db"))
  }

  /** Exact near-dup pairs (da < db, jaccard >= threshold) — identical
    * result to the all-pairs plan, at prefix-join cost. Cache-release
    * contract: see [[Dedup.jaccardPairs]]. */
  def nearDuplicatePairs(shingles: DataFrame, threshold: Double): DataFrame = {
    // the df pass and the array build both scan the shingle rows; cache
    // the (usually explode-derived) input across them
    val d = docGramArrays(shingles.cache(), threshold).cache()
    val cand = candidatesFrom(d, threshold).distinct()
    val ga = d.select(col("doc_id").as("da"), col("grams").as("ga"), col("n").as("na"))
    val gb = d.select(col("doc_id").as("db"), col("grams").as("gb"), col("n").as("nb"))
    cand.join(ga, Seq("da")).join(gb, Seq("db"))
      .select(col("da"), col("db"),
        size(array_intersect(col("ga"), col("gb"))).as("i"),
        col("na"), col("nb"))
      .select(col("da"), col("db"),
        (col("i") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
