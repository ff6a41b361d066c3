package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle transformation (Bavarian et al. 2022): the
  * code/text infilling sample prep that splits a document at two seeded
  * cut points into (prefix, middle, suffix) and re-orders it to
  * PSM form — `<PRE> prefix <SUF> suffix <MID> middle` — so an
  * autoregressive model learns to infill.
  *
  * Cut points derive from two md5 uniforms (the [[WeightedSample]]
  * construction) over the character length, sorted so a <= b. Entirely
  * row-local — no explode, no window, no shuffle; the whole transform is
  * three substrings and stays inside whole-stage codegen.
  */
object FimTransform {

  private def u(seed: String, salt: String, id: Column): Column =
    (conv(substring(md5(concat_ws("_", lit(seed), lit(salt), id.cast("string"))),
      1, 8), 16, 10).cast("double") + 1.0) / 4294967296.0

  /** Adds cut points and the PSM re-ordering: `(idCol, cut_a, cut_b,
    * fim_text)`. Documents shorter than 2 chars pass through unsplit
    * (cut_a = cut_b = length).
    */
  def psm(df: DataFrame, idCol: String, textCol: String, seed: String): DataFrame = {
    val id = col(idCol)
    val len = length(col(textCol))
    // floor(u * len) in [0, len]; sorted so a <= b
    val c1 = floor(u(seed, "a", id) * len).cast("int")
    val c2 = floor(u(seed, "b", id) * len).cast("int")
    val a = least(c1, c2)
    val b = greatest(c1, c2)
    val prefix = col(textCol).substr(lit(1), a)
    // substring(str, pos, len): middle runs [a+1, b], suffix [b+1, end]
    val middle = col(textCol).substr(a + 1, b - a)
    val suffix = col(textCol).substr(b + 1, len - b)
    df.select(id, a.as("cut_a"), b.as("cut_b"),
      concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix, lit("<MID>"), middle)
        .as("fim_text"))
  }
}
