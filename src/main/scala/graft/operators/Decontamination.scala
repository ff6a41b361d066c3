package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share at least
  * one word n-gram with an evaluation corpus (the GPT-3 appendix-C idiom —
  * Brown et al. 2020 — still the standard pretraining hygiene step).
  *
  * Scale shape: the eval corpus is benchmark-sized (thousands of docs, not
  * billions), so its distinct n-gram set is metadata-scale. It is distinct'd
  * and **broadcast**; the training side then runs a broadcast LEFT SEMI join
  * on its exploded n-grams — narrow over the 100 TB side, no shuffle of the
  * corpus, no driver collect. The per-doc `distinct` on the contaminated-id
  * output is over the (small) flagged set only.
  */
object Decontamination {

  /** Distinct word n-grams of the eval slice of `docs` (rows matching
    * `isEval`). Kept separate so callers can persist/reuse the gram set
    * across many training shards — at 100 TB you compute it once.
    */
  def evalNgrams(docs: DataFrame, textCol: String, isEval: Column, n: Int): DataFrame =
    docs.filter(isEval)
      .select(explode(TextFunctions.wordNgrams(col(textCol), n)).as("gram"))
      .distinct()

  /** Ids of non-eval documents sharing >= 1 word n-gram with the eval set. */
  def contaminatedIds(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isEval: Column,
      n: Int): DataFrame = {
    val grams = evalNgrams(docs, textCol, isEval, n)
    docs.filter(!isEval)
      .select(col(idCol), explode(TextFunctions.wordNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(grams), Seq("gram"), "left_semi")
      .select(col(idCol))
      .distinct()
  }
}
