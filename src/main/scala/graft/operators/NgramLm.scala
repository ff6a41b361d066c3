package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model cross-entropy scoring — the CCNet/Wenzek et al.
  * 2020 quality-filter idiom: train an n-gram LM on the corpus, score each
  * document by its average negative log-probability, and filter/partition
  * the corpus on that score. Documents far above the corpus-typical
  * cross-entropy are boilerplate/garbage; far below are degenerate
  * repetition.
  *
  * Scale shape:
  *
  *  - The LM "training" is one map-side-combinable groupBy over the bigram
  *    stream (the same shuffle class as token frequency), producing a
  *    model table that is VOCABULARY²-bounded — far smaller than the
  *    corpus, and reusable across scoring runs (persist it at 100 TB;
  *    conditional counts derive from the bigram table itself, no second
  *    corpus pass).
  *  - Scoring joins the document bigram stream against the model table on
  *    the bigram key: one shuffle join where the model side is the small
  *    side (bucketed/broadcast by vocabulary shard at scale), then a
  *    per-document average — partial-aggregatable.
  *
  * The conditional probability is the maximum-likelihood estimate
  * p(w2|w1) = c(w1 w2) / c(w1 ·): every scored bigram came from the
  * training corpus, so no zeros and no smoothing term — the right
  * simplification when the LM is trained on the corpus it scores (the
  * self-scoring hygiene pass), and what keeps the oracle SQL exact.
  */
object NgramLm {

  /** Bigram LM table: (gram, lp) where lp = -ln p(w2|w1), MLE. */
  def bigramLm(docs: DataFrame, textCol: String): DataFrame =
    mleFromGrams(docs
      .select(explode(TextFunctions.wordNgrams(col(textCol), 2)).as("gram")))

  /** MLE -ln p(w2|w1) from a pre-exploded bigram stream ("gram" column;
    * extra columns ignored). Shared by [[bigramLm]] and
    * [[importanceRatio]] so the latter derives both of its models from
    * ONE gram explode.
    */
  private def mleFromGrams(grams: DataFrame): DataFrame = {
    val lm = grams.groupBy(col("gram")).agg(count(lit(1)).cast("double").as("cb"))
    val uni = lm
      .groupBy(substring_index(col("gram"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("cu"))
    lm.withColumn("w1", substring_index(col("gram"), " ", 1))
      .join(uni, Seq("w1"))
      .select(col("gram"), -log(col("cb") / col("cu")) as "lp")
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", arXiv:2302.03169):
    * score every document by how much more likely its n-gram features
    * are under a LM of the TARGET slice than under the general-corpus
    * LM — li = avg over bigrams of (lp_general - lp_target), i.e. the
    * mean log importance ratio. Selecting the top-weighted documents
    * shifts the corpus mixture toward the target domain without a
    * trained classifier.
    *
    * Simplification vs the paper (stated, not hidden): the paper hashes
    * features into a fixed bucket space with add-λ smoothing; here both
    * models are exact MLE bigram tables (the [[bigramLm]] contract) and
    * the ratio averages over bigrams present in BOTH models — unseen-in-
    * target grams carry no evidence instead of a smoothing penalty.
    * This keeps the score oracle-exact; the hashed variant is one
    * `pmod(xxhash64(gram), buckets)` away and shares every shuffle.
    *
    * Scale shape: ONE gram explode feeds both model groupBys (vocab²-
    * bounded outputs) and the scoring join; scoring is two joins on the
    * gram key (model sides are the small sides — broadcast/bucket at
    * scale) and a per-document partial-aggregatable average.
    *
    * Output: (idCols..., li), docs with no both-model bigram absent.
    */
  def importanceRatio(docs: DataFrame, textCol: String, isTarget: Column,
      idCols: String*): DataFrame = {
    val grams = docs.select(
      idCols.map(col) :+ isTarget.as("__tgt") :+
        explode(TextFunctions.wordNgrams(col(textCol), 2)).as("gram"): _*)
    val lmG = mleFromGrams(grams).withColumnRenamed("lp", "lpg")
    val lmT = mleFromGrams(grams.filter(col("__tgt"))).withColumnRenamed("lp", "lpt")
    grams.join(lmG, Seq("gram")).join(lmT, Seq("gram"))
      .groupBy(idCols.map(col): _*)
      .agg(avg(col("lpg") - col("lpt")).as("li"))
  }

  /** Per-document average cross-entropy under `lm` (docs with <2 tokens
    * have no bigrams and are absent). Output: (idCols..., ce).
    */
  def crossEntropy(docs: DataFrame, textCol: String, lm: DataFrame, idCols: String*): DataFrame = {
    val grams = docs.select(
      idCols.map(col) :+ explode(TextFunctions.wordNgrams(col(textCol), 2)).as("gram"): _*)
    grams.join(lm, Seq("gram"))
      .groupBy(idCols.map(col): _*)
      .agg(avg(col("lp")).as("ce"))
  }
}
