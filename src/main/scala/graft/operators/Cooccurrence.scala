package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token co-occurrence statistics over a corpus (L4 family): adjacent
  * bigram counts with an exact-integer association score.
  *
  * The association measure is lift — p(l,r) / (p(l)·p(r)) — the
  * log-free core of PMI (Church & Hanks '90). It is emitted as
  * `lift_ppm = floor(n_pair · N · 10^6 / (n_l · n_r))`, an exact
  * integer derived from exact counts, so the result is
  * bit-reproducible across engines and partitionings (no transcendental
  * `log`, no double accumulation order).
  *
  * Scale shape (100 TB lens):
  *   - bigram construction is row-local (`zip_with` over two slices of
  *     the per-doc token array) — no self-join on position, nothing
  *     crosses the wire until counts;
  *   - the pair-count aggregation is the only corpus-sized shuffle, and
  *     it partial-aggregates map-side like any hash count;
  *   - marginals (`n_l`, `n_r`) and the grand total are derived from
  *     the AGGREGATED pair frame — vocab²-bounded, orders of magnitude
  *     smaller than the token stream — which is cached so the tokenize
  *     scan runs once, not four times (same diamond treatment as
  *     TfIdf's tf frame);
  *   - the marginal joins are token-keyed shuffle joins (vocabulary is
  *     corpus-scale: deliberately NOT broadcast, same reasoning as
  *     TfIdf's df join), with the `minCount` filter applied to the
  *     probe side first so only candidate pairs flow through them.
  */
object Cooccurrence {

  /** Adjacent-bigram lift table: (tok_l, tok_r, n_pair, lift_ppm) for
    * pairs with `n_pair >= minCount`, ordered by (n_pair DESC, tok_l,
    * tok_r), truncated to `topN` rows.
    *
    * @param docs   frame with a `tokens` array-of-string column
    */
  def bigramLift(docs: DataFrame, tokens: Column, minCount: Long, topN: Int): DataFrame = {
    val big = docs
      .select(tokens.as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(explode(zip_with(
        slice(col("arr"), lit(1), size(col("arr")) - 1),
        slice(col("arr"), lit(2), size(col("arr")) - 1),
        (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))

    // Vocab²-bounded; cached so tot/lm/rm/candidates don't re-tokenize.
    val pc = big.groupBy(col("l"), col("r")).agg(count(lit(1)).as("n_pair")).cache()

    val tot = pc.agg(sum(col("n_pair")).cast("decimal(38,0)").as("n"))
    val lm  = pc.groupBy(col("l")).agg(sum(col("n_pair")).cast("decimal(38,0)").as("n_l"))
    val rm  = pc.groupBy(col("r")).agg(sum(col("n_pair")).cast("decimal(38,0)").as("n_r"))

    // Exact floor division without a `div` operator: num % den is an
    // exact decimal remainder, so (num - num % den) / den is an exactly
    // representable integer quotient (both sides positive).
    val num = col("n_pair").cast("decimal(38,0)") * col("n") * lit(1000000L)
    val den = col("n_l") * col("n_r")
    pc.filter(col("n_pair") >= minCount)
      .crossJoin(broadcast(tot))
      .join(lm, "l")
      .join(rm, "r")
      .select(
        col("l").as("tok_l"), col("r").as("tok_r"), col("n_pair"),
        ((num - num % den) / den).cast("long").as("lift_ppm"))
      .orderBy(col("n_pair").desc, col("tok_l"), col("tok_r"))
      .limit(topN)
  }

  /** Pairwise vocabulary Jaccard between the groups of `groupCol`
    * (sa < sb), in exact-integer ppm: how much two sources/domains/
    * crawls share their token vocabulary — the corpus-mixture
    * diagnostic behind dedup-across-sources and mixture weighting.
    *
    * Scale shape: one distinct (group, token) shuffle, then a per-token
    * `collect_set` of groups (bounded by the number of groups — dozens
    * to hundreds, NOT corpus-sized) whose pair expansion is row-local;
    * intersection counts aggregate pairs, and the ≤ groups² result
    * joins the broadcast per-group sizes. No vocab×vocab anything.
    */
  def vocabOverlap(docs: DataFrame, groupCol: Column, tokens: Column): DataFrame = {
    val ts = docs.select(groupCol.as("g"), explode(tokens).as("tok")).distinct()
    val sizes = ts.groupBy(col("g")).agg(count(lit(1)).cast("decimal(38,0)").as("n"))
    // per token: sorted group list (small), all ordered pairs row-locally
    val inter = ts
      .groupBy(col("tok"))
      .agg(sort_array(collect_set(col("g"))).as("gs"))
      .select(explode(flatten(expr(
        "transform(gs, (a, i) -> transform(slice(gs, i + 2, size(gs)), b -> struct(a AS sa, b AS sb)))"
      ))).as("p"))
      .select(col("p.sa").as("sa"), col("p.sb").as("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("i"))
    val num = col("i") * lit(1000000L)
    val den = col("na") + col("nb") - col("i")
    inter
      .join(broadcast(sizes.select(col("g").as("sa"), col("n").as("na"))), "sa")
      .join(broadcast(sizes.select(col("g").as("sb"), col("n").as("nb"))), "sb")
      .select(col("sa"), col("sb"), col("i").cast("long").as("n_inter"),
        ((num - num % den) / den).cast("long").as("jaccard_ppm"))
      .orderBy(col("sa"), col("sb"))
  }
}
