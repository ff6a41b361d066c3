package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document EXACT paragraph dedup, first-occurrence-wins — the
  * RefinedWeb/MassiveText granularity between [[LineDedup]] (lines seen
  * in >= k docs are boilerplate) and whole-doc exact dedup ([[Dedup]]):
  * a paragraph keeps its FIRST occurrence in corpus order and every
  * later verbatim copy is dropped, wherever it appears.
  *
  * Scale shape (the reason this outlives pair-wise methods): the corpus
  * explodes to one row per paragraph, first-occurrence ranking is a
  * window keyed by the paragraph's 128-bit content hash — paragraphs
  * hash-partition, so the shuffle is linear in corpus size and identical
  * copies co-locate no matter how many documents share them — and
  * reassembly is one groupBy(doc). No pair enumeration at any stage.
  * The md5 window key keeps paragraph TEXT out of the dedup shuffle;
  * 128 bits keeps the collision expectation ~2^-54 even at 2^37
  * paragraphs (a 100 TB corpus), where a 64-bit key would already
  * expect hundreds of false merges.
  *
  * Corpus order is (docIdCol, paragraph index) — deterministic and
  * engine-independent, so re-runs and re-shards keep the same survivor
  * (the same contract as [[Dedup]]'s min-id survivorship).
  */
object ParagraphDedup {

  /** One row per fixed-width word-window paragraph: (id, idx, para).
    * Documents are split into consecutive `wordsPerPara`-word windows
    * (the last one ragged); an empty/whitespace doc contributes no rows.
    */
  def paragraphs(docs: DataFrame, idCol: String, textCol: String,
      wordsPerPara: Int): DataFrame = {
    val ts = filter(split(col(textCol), " "), w => w =!= lit(""))
    val nChunks = ceil(size(ts) / lit(wordsPerPara.toDouble)).cast("int")
    // sequence(0, -1) counts DOWN in Spark — guard the empty-doc case
    // explicitly instead of leaning on the oracle-side empty range
    val idxs = when(nChunks > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    docs.select(col(idCol), posexplode(
      transform(idxs, i =>
        array_join(slice(ts, i * wordsPerPara + 1, lit(wordsPerPara)), " "))))
      .toDF(idCol, "idx", "para")
  }

  /** Per-document result of first-occurrence paragraph dedup:
    * (id, carryCols..., n_paras, n_dup, cleaned) where `cleaned` is the
    * document re-joined from its surviving paragraphs in order (empty
    * string when every paragraph was a later copy). `carryCols` are
    * per-document attributes to pass through (constant within a doc).
    */
  def stripFirstOccurrence(docs: DataFrame, idCol: String, textCol: String,
      wordsPerPara: Int, carryCols: Seq[String] = Nil): DataFrame = {
    val carried =
      if (carryCols.isEmpty) docs.select(col(idCol))
      else docs.select((idCol +: carryCols).map(col): _*)
    val paras = paragraphs(docs, idCol, textCol, wordsPerPara)
      .withColumn("__h", md5(col("para")))
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol), col("idx"))
    val ranked = paras.withColumn("__rn", row_number().over(w))
    val perDoc = ranked.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        count(when(col("__rn") > 1, 1)).as("n_dup"),
        // array_sort on (idx, para) structs orders by idx; paragraphs
        // re-join in document order regardless of aggregation order
        coalesce(array_join(transform(
          array_sort(collect_list(when(col("__rn") === 1,
            struct(col("idx"), col("para"))))),
          s => s.getField("para")), " "), lit("")).as("cleaned"))
    // a doc whose every paragraph vanished still has n_paras rows above
    // (count counts rows, not kept ones) — but a fully-empty INPUT doc has
    // no paragraph rows at all, so restore it via the carried frame
    carried.join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_paras", "n_dup"))
      .na.fill("", Seq("cleaned"))
  }
}
