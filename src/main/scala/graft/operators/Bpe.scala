package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair encoding (Sennrich et al., ACL 2016 — the subword tokenizer
  * behind GPT-2-style vocabularies), as distributed dataflow.
  *
  * '''Training''' operates on the word-FREQUENCY table, not the corpus:
  * the classic observation that makes BPE learnable at scale — 100 TB of
  * text collapses to a vocabulary-sized (word, count) frame after one
  * aggregation, and every merge round is then a vocabulary-scale job.
  * Each round: one flatMap+groupBy counts adjacent symbol pairs weighted
  * by word frequency (partial-aggregated), one 1-row argmax action picks
  * the next merge (count desc, pair lexicographic — deterministic), and
  * a row-local map applies it. Rounds are inherently sequential (each
  * merge changes the pair statistics the next round sees); the job graph
  * per round is static and the word table is re-materialized every few
  * rounds to truncate lineage.
  *
  * '''Encoding''' is the hot path at 100 TB and is embarrassingly
  * parallel: the learned merge list broadcasts (metadata-scale) and each
  * document encodes row-locally in a typed mapPartitions stage (policy
  * §2.13: genuinely iterative per-word logic — the merge loop — is the
  * sanctioned mapPartitions case). Encode semantics are the canonical
  * priority loop: repeatedly merge the present pair with the lowest
  * learned rank (all its occurrences, left to right) until no learned
  * pair remains — NOT "apply rules in order once", which diverges when a
  * later merge creates an earlier rule's pair.
  *
  * Differential gate: [[graft.fixtures.BpeRef]] re-implements both
  * phases sequentially (hash-map pair counting, list-walk encoding) and
  * q88 compares end-to-end token streams; a spec pins learner parity.
  */
object Bpe {

  /** (word, cnt) frequency table over lowercased alpha tokens. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.alphaTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Learn `nMerges` merges distributed. Stops early when no pair occurs
    * more than once (merging hapax pairs adds vocabulary, not value). */
  def learnMerges(wordCounts: DataFrame, nMerges: Int): Seq[(String, String)] = {
    val spark = wordCounts.sparkSession
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] = wordCounts
      .select(col("word"), col("cnt").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString): Seq[String], c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      // re-materialize periodically: 30 narrow maps are fine for
      // execution but the re-analyzed plan grows quadratically
      if (round % 10 == 0) words = words.localCheckpoint()
      val top = words
        .flatMap { case (syms, c) =>
          if (syms.lengthCompare(2) < 0) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, c))
        }
        .toDF("a", "b", "c")
        .groupBy($"a", $"b").agg(sum($"c").as("n"))
        .orderBy($"n".desc, $"a", $"b")
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption.filter(_._3 >= 2) match {
        case Some((a, b, _)) =>
          merges += ((a, b))
          words = words.map { case (syms, c) => (mergeOnce(syms, a, b), c) }
          round += 1
        case None => done = true
      }
    }
    merges.toSeq
  }

  /** Merge all non-overlapping (a, b) adjacencies, left to right. */
  private[operators] def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Canonical priority-loop encode of one word. */
  private[operators] def encodeWord(
      word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    var continue = syms.lengthCompare(2) >= 0
    while (continue) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < syms.length) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else syms = mergeOnce(syms, best._1, best._2)
    }
    syms
  }

  /** Row-local distributed encode: (doc_id, n_tokens, tokens_text) with
    * the per-word subword streams joined by single spaces in document
    * order. The merge list broadcasts via the closure (metadata-scale).
    */
  def encode(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rank)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val r = bc.value
        it.map { case (id, text) =>
          val toks = Option(text).getOrElse("")
            .toLowerCase(java.util.Locale.ROOT)
            .split("[^a-z]+").iterator.filter(_.nonEmpty)
            .flatMap(w => encodeWord(w, r)).toArray
          (id, toks.length, toks.mkString(" "))
        }
      }
      .toDF("doc_id", "n_tokens", "tokens_text")
  }
}
