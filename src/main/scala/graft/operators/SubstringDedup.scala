package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication signal (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better"): find every maximal span
  * of a document whose `minLen`-char windows ALL also occur in at least
  * `minDocs` distinct documents, and report how many characters those
  * duplicated spans cover. The suffix-array machinery of the paper is a
  * single-node construction; the Spark-native equivalent is the sliding
  * char-window explode + frequency join below, which reaches the same
  * duplicated-span boundaries for stride-1 windows:
  *
  *  1. every position's `minLen`-char window, hashed to 8 bytes
  *     (xxhash64) so the frequency groupBy and join-back shuffle 8-byte
  *     keys instead of `minLen`-char strings — an intermediate only, so
  *     hash choice never reaches the gated output (collision odds at
  *     ~n²/2⁶⁴ are below any realistic corpus);
  *  2. window → distinct-doc frequency (partial-aggregated groupBy),
  *     shared windows filtered to `>= minDocs`;
  *  3. per-doc island merge of overlapping/adjacent shared windows via
  *     the gaps-and-islands running max — each surviving island is one
  *     maximal duplicated span [s, e).
  *
  * Scale shape: the explode multiplies the corpus by ~1 row per char —
  * the honest cost of EXACT substring dedup — but every stage after it
  * is a key-partitioned aggregate/join on 8-byte keys, and the per-doc
  * window functions partition on doc_id. At 100 TB the standard
  * mitigation is stride > 1 candidate discovery (trading span-boundary
  * resolution for an O(stride) row reduction) before a stride-1 refine
  * over candidate docs only.
  */
object SubstringDedup {

  /** Per-doc duplicated-span stats: (doc_id, n_islands, removed_chars,
    * remaining_chars) for docs carrying at least one shared window.
    */
  def spanStats(
      docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 20, minDocs: Int = 2): DataFrame = {
    // windows: (doc_id, len, pos, h) — text dropped before the shuffle
    val wins = docs.filter(length(col(textCol)) >= minLen)
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"),
        length(col(textCol)).as("len"))
      .withColumn("pos", explode(sequence(lit(1), col("len") - (minLen - 1))))
      .select(col("doc_id"), col("len"), col("pos"),
        xxhash64(expr(s"substring(__t, pos, $minLen)")).as("h"))
    val cached = wins.cache()
    // minDocs=2 (the common case) needs no distinct count at all:
    // "two distinct docs" is min != max, and min/max partial-aggregate
    // fully map-side where countDistinct's two-phase plan must shuffle
    // the (h, doc_id) pair stream
    val freq =
      if (minDocs == 2)
        cached.groupBy(col("h"))
          .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
          .filter(col("d0") =!= col("d1")).select("h")
      else
        cached.groupBy(col("h"))
          .agg(countDistinct(col("doc_id")).as("wdf"))
          .filter(col("wdf") >= minDocs).select("h")
    val shared = cached.join(freq, Seq("h")).select("doc_id", "len", "pos")
    // gaps-and-islands: a window starts a new island when it begins past
    // the furthest end seen so far in this doc
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + minLen)
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    val islands = shared
      .withColumn("new_island",
        when(col("pos") > coalesce(prevEnd, lit(0L)), 1).otherwise(0))
      .withColumn("island",
        sum(col("new_island")).over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(max(col("len")).as("len"), min(col("pos")).as("s"),
        (max(col("pos")) + minLen).as("e"))
    islands.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("e") - col("s")).as("removed_chars"),
        (max(col("len")) - sum(col("e") - col("s"))).as("remaining_chars"))
  }
}
