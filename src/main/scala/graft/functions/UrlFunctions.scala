package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-pipeline hygiene step that runs BEFORE
  * any URL-keyed dedup or per-domain capping ([[graft.operators.DomainCaps]]):
  * crawl frontiers emit the same page under many spellings (scheme/host
  * case, default ports, tracking params, trailing slashes, fragments),
  * and exact-URL dedup without canonicalization silently keeps them all.
  *
  * The rules implemented (a SURT-lite subset of the usual crawl
  * canonicalizers):
  *   1. scheme and host lowercased; a leading `www.` stripped;
  *   2. the scheme's default port dropped (`:80` http, `:443` https) —
  *      any OTHER explicit port is significant and kept;
  *   3. the fragment dropped;
  *   4. trailing slashes stripped from the path (bare authority -> `/`);
  *   5. tracking query params dropped (`utm_*`, `fbclid*`, `gclid*`),
  *      the survivors sorted so param order cannot split a page.
  *
  * Everything is per-row `regexp_extract` / array-HOF work on codegen'd
  * builtins — no shuffle, no UDF — so at 100 TB the canonical column is
  * computed in the scan's project and the only exchange is whatever the
  * caller's groupBy(canonical) needs.
  */
object UrlFunctions {

  private val Scheme = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Canonical form of `u` per the object scaladoc. Input that does not
    * look like scheme://authority... degrades gracefully (empty extracts),
    * it is not validated — canonicalization is a normalizer, not a parser.
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, Scheme, 1))
    val authority = regexp_extract(u, s"$Scheme([^/?#]*)", 2)
    val host = regexp_replace(
      lower(regexp_extract(authority, "^([^:]*)", 1)), "^www\\.", "")
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val rawPath = regexp_extract(u, s"$Scheme[^/?#]*([^?#]*)", 2)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val params = array_sort(filter(split(regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => p =!= lit("") && !(p.startsWith("utm_") ||
        p.startsWith("fbclid") || p.startsWith("gclid"))))
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, portPart, path, queryPart)
  }

  /** Host component of a canonical URL (for per-host rollups). */
  def canonicalHost(canonical: Column): Column =
    regexp_extract(canonical, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)

  /** Every dot-suffix of a host: `a.b.c` -> [`a.b.c`, `b.c`, `c`] — the
    * equi-joinable spelling of "host ends with blocked domain". A
    * blocklist match via `endsWith` is a non-equi predicate and plans as
    * a nested loop against the list; exploding the (label-count-bounded,
    * ≤ ~5 element) suffix chain instead turns it into a plain hash
    * semi-join on the suffix key — broadcast against any realistic
    * blocklist, shuffle-free over the corpus side.
    */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts) - i + 1), "."))
  }
}
