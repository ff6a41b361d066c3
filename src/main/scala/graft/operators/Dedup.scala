package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.12 L1/L2).
  *
  * Exact dedup is a hash-groupBy: one shuffle on the content hash, fully
  * partial-aggregatable, no skew risk beyond genuinely duplicated content
  * (AQE skew handling covers that). Near-dup lives in MinHashLSH/SimHash.
  */
object Dedup {

  /** Keep one deterministic survivor (min tieBreak) per exact content hash. */
  def exact(df: DataFrame, content: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(sha2(content, 256)).orderBy(tieBreak)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct n-character shingles per document: (doc_id, s) rows.
    * Shingling is row-local (transform over a sequence — no shuffle);
    * array_distinct applies set semantics before the explode so the
    * exploded row count is bounded by distinct shingles, not text length.
    */
  def charShingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.filter(length(col(textCol)) >= n)
      .select(
        col(idCol).as("doc_id"),
        explode(array_distinct(expr(
          s"transform(sequence(1, length(lower($textCol)) - ${n - 1}), i -> substring(lower($textCol), i, $n))"
        ))).as("s"))

  /** n-gram Jaccard similarity over pre-exploded shingle rows (doc_id, s).
    * Returns (da, db, jaccard) for da < db with jaccard >= threshold.
    * This is the exact all-pairs path (the oracle); at 100 TB feed
    * MinHashLSH.candidatePairs into `jaccardForPairs` instead so the
    * shingle-equality join only touches candidate docs.
    */
  def jaccardPairs(shingles: DataFrame, threshold: Double): DataFrame = {
    val a = shingles.select(col("doc_id").as("da"), col("s").as("sa"))
    val b = shingles.select(col("doc_id").as("db"), col("s").as("sb"))
    val inter = a.join(b, col("sa") === col("sb") && col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    withJaccard(inter, shingleSizes(shingles), threshold)
  }

  /** Exact Jaccard restricted to a candidate pair set (the LSH refine). */
  def jaccardForPairs(shingles: DataFrame, pairs: DataFrame, threshold: Double): DataFrame = {
    val a = shingles.select(col("doc_id").as("da"), col("s").as("sa"))
    val b = shingles.select(col("doc_id").as("db"), col("s").as("sb"))
    // The sa === sb conjunct is pushed into the second equi-join by
    // Catalyst, so the intermediate is candidate-pair x shared-shingles,
    // never the full shingle cross product.
    val inter = pairs
      .join(a, Seq("da"))
      .join(b, Seq("db"))
      .filter(col("sa") === col("sb"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("i"))
    withJaccard(inter, shingleSizes(shingles), threshold)
  }

  private def shingleSizes(shingles: DataFrame): DataFrame =
    shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))

  private def withJaccard(inter: DataFrame, sizes: DataFrame, threshold: Double): DataFrame = {
    val na = sizes.select(col("doc_id").as("da"), col("n").as("na"))
    val nb = sizes.select(col("doc_id").as("db"), col("n").as("nb"))
    inter.join(na, Seq("da")).join(nb, Seq("db"))
      .select(col("da"), col("db"),
        (col("i") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
