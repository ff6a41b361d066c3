package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain document caps — the URL-hygiene / source-balancing step of
  * a web-scale training pipeline (the public CommonCrawl-derived recipes
  * cap how many pages any one registered domain may contribute so that
  * boilerplate-heavy domains don't dominate the mixture).
  *
  * Parsing is plain regexp (codegen'd, row-local): scheme://host/...
  * -> host -> registered domain (last two labels — a public-suffix list
  * would slot in as a broadcast join against the suffix table, same
  * shape).
  *
  * The cap itself is a top-k per group, which at 100 TB has a skew
  * problem: one hot domain (a million pages of the same wiki) lands on
  * one window partition. [[cap]] therefore runs the SALTED two-stage
  * form — the same trick as q21's top-k and q57's salted join, and like
  * them EXACTLY result-preserving: any row in a domain's true global
  * top-k is necessarily in the top-k of its salt slice, so pass 1
  * (partitioned by (domain, salt), bounded at |domain|/nSalts rows per
  * task) can only discard rows the exact answer discards, and pass 2
  * ranks at most k * nSalts survivors per domain. The single-window
  * spelling is the oracle.
  */
object DomainCaps {

  /** Host part of scheme://host/path. */
  def urlHost(url: Column): Column = regexp_extract(url, "^[a-z]+://([^/]+)", 1)

  /** Registered domain = last two dot-labels of the host. */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Keep at most `maxPerDomain` rows per registered domain, preferring
    * high `orderCol` (ties by idCol). Input needs (idCol, urlCol,
    * orderCol); output adds `domain` and `kept`.
    */
  def cap(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      orderCol: String,
      maxPerDomain: Int,
      nSalts: Int = 16): DataFrame = {
    val withDomain = df.withColumn("domain", registeredDomain(urlHost(col(urlCol))))
    // pass 1: bound the hot-domain partition — local top-k per salt slice
    val salted = withDomain.withColumn("salt", pmod(hash(col(idCol)), lit(nSalts)))
    val w1 = Window.partitionBy(col("domain"), col("salt"))
      .orderBy(col(orderCol).desc, col(idCol))
    val survivors = salted
      .withColumn("rn1", row_number().over(w1))
      .filter(col("rn1") <= maxPerDomain)
      .drop("rn1", "salt")
    // pass 2: exact rank over <= maxPerDomain * nSalts rows per domain
    val w2 = Window.partitionBy(col("domain"))
      .orderBy(col(orderCol).desc, col(idCol))
    val ranked = survivors.withColumn("rn", row_number().over(w2))
    // kept flag is re-joined onto the FULL input so callers can also see
    // what the cap dropped (the usual audit requirement)
    withDomain.join(
      ranked.filter(col("rn") <= maxPerDomain).select(col(idCol), lit(true).as("kept")),
      Seq(idCol), "left")
      .withColumn("kept", coalesce(col("kept"), lit(false)))
  }
}
