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

  /** Registered domain = last two dot-labels of the host. NOTE: this
    * collapses every site under a multi-part public suffix (all of
    * *.co.uk becomes "co.uk") and yields "" for single-label hosts —
    * fine for the synthetic bench (the oracle applies the same rule),
    * wrong on real URLs. For those, use [[registeredDomainPsl]].
    */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Public-suffix-aware registered domain: `suffixes` is the
    * broadcastable (suffix) table distilled from the Mozilla Public
    * Suffix List (publicsuffix.org; not bundled — zero-egress build).
    * Longest-match semantics: the registered domain is one label more
    * than the longest listed suffix that terminates the host. Rows whose
    * host matches no listed suffix fall back to the last-two-labels rule.
    *
    * Join shape: each host explodes to its dot-suffixes (a host has
    * O(labels) of them, ~4 — metadata scale), inner-joins the broadcast
    * suffix table, and keeps the longest hit per row — no shuffle on the
    * data side.
    */
  def withRegisteredDomainPsl(
      df: DataFrame, urlCol: String, suffixes: DataFrame,
      out: String = "domain"): DataFrame = {
    val withHost = df.withColumn("__host", urlHost(col(urlCol)))
      .withColumn("__labels", split(col("__host"), "\\."))
    // (host, nLab) per candidate suffix: the last 1..n-1 labels (the
    // full host is never its own suffix; a 1-label host has none).
    // sequence(0, size-1) is always ascending (size >= 1 for any split
    // result) and the i >= 1 filter leaves 1..size-1 — the naive
    // sequence(1, size-1) evaluates DESCENDING to [1, 0] for a 1-label
    // host (localhost, or a '' host from an unparseable URL) and the
    // i=0 slice aborts the whole job with INVALID_PARAMETER_VALUE
    val matched = withHost
      .select(col("__host"), col("__labels"))
      .distinct()
      .select(col("__host"), explode(expr(
        "transform(filter(sequence(0, size(__labels) - 1), i -> i >= 1), " +
          "i -> struct(array_join(slice(__labels, -i, i), '.') as suffix, i as n))"))
        .as("c"))
      .select(col("__host"), col("c.suffix").as("suffix"), col("c.n").as("n"))
      .join(broadcast(suffixes.select(col("suffix"))), Seq("suffix"), "left_semi")
      .groupBy(col("__host"))
      .agg(max(col("n")).as("__slab"))
    // matched is one row per DISTINCT suffix-listed host — usually far
    // smaller than the data side but not guaranteed broadcastable at
    // 100 TB, so no hint: AQE picks broadcast when it fits
    withHost
      .join(matched, Seq("__host"), "left")
      .withColumn(out,
        when(col("__slab").isNotNull && (col("__slab") + 1 <= size(col("__labels"))),
          expr("array_join(slice(__labels, -(__slab + 1), __slab + 1), '.')"))
        .otherwise(registeredDomain(col("__host"))))
      .drop("__host", "__labels", "__slab")
  }

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
