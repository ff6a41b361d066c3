package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval scoring (Robertson & Zaragoza 2009) — the
  * standard lexical ranking function, here as a corpus-scale batch
  * operator: score every document against a term set and keep the top-k
  * per term.
  *
  * Scale shape (the part that matters at 100 TB):
  *
  *  - Corpus statistics (N, avgdl) are ONE aggregate producing two
  *    scalars — metadata.
  *  - The term set is metadata-scale by construction (a query workload,
  *    not the corpus); it is collected and pushed into an `isin` filter
  *    that runs BEFORE any shuffle, so the only token occurrences that
  *    ever hit the wire are those of the query terms themselves. The
  *    full token stream is never shuffled for scoring.
  *  - Document frequency is derived from the (already small) per-term
  *    tf frame and broadcast back.
  *  - Final ranking is a per-term window top-k over the scored frame —
  *    per-key, no global sort.
  *
  * Term selection (when the caller wants "the corpus' own head terms"
  * rather than an external query list) is the one full-token-stream
  * aggregation, and is the same map-side-combinable groupBy as plain
  * token frequency (q37) — the classic "train then query" split.
  */
object Bm25 {

  /** The `nTerms` most frequent tokens (ties broken by token asc). */
  def topTerms(docs: DataFrame, textCol: String, nTerms: Int): Seq[String] =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(nTerms)
      .collect().map(_.getString(0)).toSeq

  /** Top-k documents per term by BM25 (k1=1.2, b=0.75), with
    * deterministic doc_id tie-break. Output: (term, rnk, doc_id, score).
    * `score` is left unrounded — callers canonicalize.
    */
  def topK(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ts = docs.select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("ts"))
    // corpus statistics: two scalars, one aggregate
    val st = ts.agg(count(lit(1)).cast("double"), avg(size(col("ts"))).cast("double")).head()
    val (n, avgdl) = (st.getDouble(0), st.getDouble(1))
    // tf: filter to the term set BEFORE the shuffle — only query-term
    // occurrences are ever aggregated
    val tf = ts
      .select(col("doc_id"), size(col("ts")).cast("double").as("dl"), explode(col("ts")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("tok").as("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val idf: Column = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val scored = tf.join(broadcast(df), Seq("term"))
      .select(col("term"), col("doc_id"),
        (idf * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))).as("score"))
    val w = Window.partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("term"), col("rnk"), col("doc_id"), col("score"))
  }
}
