package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase search over an inverted index with positions — the
  * retrieval-side complement to Bm25's bag-of-words ranking: "these
  * exact tokens, adjacent, in order" (classic positional-postings
  * intersection, Manning/Raghavan/Schütze IIR §2.4).
  *
  * The classic spelling joins the postings of consecutive phrase terms
  * pairwise on (doc, pos+1) — one self-join PER TOKEN of the longest
  * phrase, each a full shuffle of the postings that survive so far.
  * Here the whole batch of phrases resolves in ONE join + ONE
  * aggregation regardless of phrase length or phrase count:
  *
  *  - the phrase set unrolls to a tiny (pid, offset, tok) frame,
  *    broadcast onto the postings — the join doubles as the vocabulary
  *    filter, so only postings of tokens that appear in SOME phrase
  *    ever leave the scan;
  *  - each surviving posting proposes the phrase start it would imply
  *    (start = pos − offset);
  *  - a candidate start is a match iff ALL `len` offsets proposed it —
  *    a count == len predicate on a partial-aggregatable groupBy, no
  *    positional arrays, no per-phrase passes.
  *
  * Repeated tokens inside a phrase ("table table") and overlapping
  * occurrences fall out correctly: every posting can support several
  * (offset → start) hypotheses and each is counted against its own
  * start. At 100 TB the postings build is one scan + explode of the
  * corpus; everything after is proportional to the postings of the
  * phrase vocabulary, which is why the batch-broadcast form matters —
  * a 10k-phrase workload still makes exactly one pass.
  */
object PhraseSearch {

  /** Positional postings (doc_id, pos, tok): lowercase alpha token
    * runs, 1-based positions in the filtered token stream (the q138
    * tokenization, so classifier and search agree on what a token is).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(filter(split(lower(col(textCol)), "[^a-z]+"), t => t =!= lit(""))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))

  /** All (pid, doc_id, start) phrase occurrences, start 1-based.
    * `phrases` must carry distinct pids and non-empty token lists.
    */
  def search(post: DataFrame, phrases: Seq[(Int, Seq[String])]): DataFrame = {
    require(phrases.nonEmpty, "empty phrase batch")
    require(phrases.map(_._1).distinct.size == phrases.size, "duplicate pid")
    require(phrases.forall(_._2.nonEmpty), "empty phrase")
    val spark = post.sparkSession
    import spark.implicits._
    val pt = phrases.flatMap { case (pid, toks) =>
      toks.zipWithIndex.map { case (t, off) =>
        (pid, off.toLong, t, toks.size.toLong)
      }
    }.toDF("pid", "__off", "tok", "__len")
    post.join(broadcast(pt), "tok")
      .groupBy($"pid", $"doc_id", ($"pos" - $"__off").as("start"), $"__len")
      .agg(count(lit(1)).as("__hit"))
      .filter($"__hit" === $"__len")
      .select($"pid", $"doc_id", $"start")
  }
}
