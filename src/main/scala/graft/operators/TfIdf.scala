package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TF-IDF keyword extraction — the document-side complement of BM25
  * retrieval ([[Bm25]] ranks documents FOR a term; this ranks terms FOR
  * a document): score = tf(d, t) * ln(N / df(t)), top-k terms per doc.
  *
  * Scale shape at 100 TB:
  *
  *  - tf is the one full-token-stream aggregation — the same map-side-
  *    combinable groupBy((doc, term)) as plain token counting (q37).
  *  - df derives from the ALREADY-AGGREGATED tf frame (one row per
  *    (doc, term)), so the df pass never re-reads text. The tf ⋈ df
  *    join shuffles on the term key; stopword-grade terms are the
  *    classic skew case and resolve via AQE's skew-join split (we
  *    deliberately do NOT broadcast df: at corpus scale the vocabulary
  *    is Zipf-long-tailed and can exceed any broadcast cap).
  *  - The final rank is a per-document window top-k — per-key, bounded
  *    by document vocabulary, no global sort.
  *
  * Scores are snapped to a 6dp decimal grid (through an 8dp cast, the
  * q119 idiom) BEFORE ranking, so float accumulation differences
  * between engines can never flip a rank at a quota boundary; ties
  * break by term ascending.
  */
object TfIdf {

  /** Top-k TF-IDF keywords per document over [[TextFunctions.alphaTokens]].
    * Output: (doc_id, carryCols…, term, score DECIMAL(18,6), rnk).
    * `nDocs` is the corpus size used in the idf — callers pass
    * `docs.count()` (a metadata scalar) so the operator itself stays a
    * single lazy plan.
    */
  def topKeywords(
      docs: DataFrame, idCol: String, textCol: String, k: Int, nDocs: Long,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val carry = carryCols.map(col)
    // cached: the scored join and the df derivation both read tf, and the
    // two branches aggregate different key sets (column pruning strips the
    // carry columns from the df branch), so exchange reuse can't kick in —
    // without the cache the full tokenize + token-stream shuffle runs
    // TWICE. jaccardPairs cache-release contract: the session running
    // back-to-back pipelines clears the cache between them (Bench/Verify
    // do).
    val tf = docs
      .select((col(idCol).as("doc_id") +: carry) :+
        explode(TextFunctions.alphaTokens(col(textCol))).as("term"): _*)
      .groupBy((col("doc_id") +: carry) :+ col("term"): _*)
      .agg(count(lit(1)).cast("double").as("tf"))
      .cache()
    // df = distinct DOCS containing the term, not tf rows: with doc-
    // constant carryCols the two are identical, but a caller passing a
    // non-doc-constant carry column would otherwise silently inflate df
    // (and deflate every idf). countDistinct keeps the contract robust
    // instead of unstated; it still reads the aggregated tf frame, never
    // the token stream.
    val df = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val scored = tf.join(df, Seq("term"))
      .withColumn("score",
        round(((col("tf") * log(lit(nDocs.toDouble) / col("df")))
          .cast(DecimalType(18, 8))), 6).cast(DecimalType(18, 6)))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select((col("doc_id") +: carry) ++ Seq(col("term"), col("score"), col("rnk")): _*)
  }
}
