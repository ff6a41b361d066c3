package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
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
  def bigramLm(docs: DataFrame, textCol: String): DataFrame = {
    val grams = docs
      .select(explode(TextFunctions.wordNgrams(col(textCol), 2)).as("gram"))
    val lm = grams.groupBy(col("gram")).agg(count(lit(1)).cast("double").as("cb"))
    val uni = lm
      .groupBy(substring_index(col("gram"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("cu"))
    lm.withColumn("w1", substring_index(col("gram"), " ", 1))
      .join(uni, Seq("w1"))
      .select(col("gram"), -log(col("cb") / col("cu")) as "lp")
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
