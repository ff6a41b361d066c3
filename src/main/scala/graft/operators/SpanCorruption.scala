package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al. 2020, "denoising objective"):
  * the training-sample prep step that masks ~15% of tokens, collapses
  * each masked RUN to one `<extra_id_K>` sentinel in the input, and
  * emits the dropped spans (prefixed by their sentinel) as the target
  * sequence.
  *
  * Masking is seeded-deterministic per (doc, position) via the md5
  * uniform (same construction as [[WeightedSample.uniform]]) — no RNG
  * state, so any engine reproduces the identical corruption and the
  * whole transform differential-gates.
  *
  * Scale posture: tokens explode per doc; run detection and sentinel
  * numbering are windows PARTITIONED BY doc (keyed, partition-parallel —
  * never a global window); reassembly is one groupBy(doc). Cost is
  * linear in token count, shuffles are all on the doc key.
  */
object SpanCorruption {

  /** Per-document corruption summary: `(idCol, n_tokens, n_masked,
    * n_spans, masked_text, target_text)`.
    */
  def denoise(
      df: DataFrame, idCol: String, textCol: String, seed: String,
      p: Double = 0.15): DataFrame = {
    val id = col(idCol)
    val toks = df.select(id,
      posexplode(filter(split(col(textCol), " "), t => t =!= "")).as(Seq("pos", "tok")))
    // seeded uniform in (0,1] per (doc, pos) — the WeightedSample draw
    val u = (conv(substring(md5(
      concat_ws("_", lit(seed), id.cast("string"), col("pos").cast("string"))),
      1, 8), 16, 10).cast("double") + 1.0) / 4294967296.0
    val wOrd = Window.partitionBy(id).orderBy(col("pos"))
    val masked = toks.withColumn("m", u < p)
      .withColumn("run_start", col("m") && !coalesce(lag(col("m"), 1).over(wOrd), lit(false)))
      .withColumn("island",
        sum(when(col("run_start"), 1L).otherwise(0L))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sentinel = concat(lit("<extra_id_"), (col("island") - 1).cast("string"), lit(">"))
    val maskedPiece = when(!col("m"), col("tok"))
      .when(col("run_start"), sentinel) // nulls (run continuations) drop out
    val targetPiece = when(col("m"),
      when(col("run_start"), concat(sentinel, lit(" "), col("tok")))
        .otherwise(col("tok")))
    def joined(piece: Column): Column =
      concat_ws(" ", transform(
        array_sort(collect_list(when(piece.isNotNull, struct(col("pos"), piece.as("s"))))),
        x => x.getField("s")))
    masked
      .select(id, col("pos"), col("m"), col("island"),
        maskedPiece.as("mp"), targetPiece.as("tp"))
      .groupBy(id)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"),
        max(col("island")).as("n_spans"),
        joined(col("mp")).as("masked_text"),
        joined(col("tp")).as("target_text"))
  }
}
