package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate sketching (SURVEY.md §2.12 L2; Charikar 2002).
  *
  * Two variants share the same bit definition (so they agree exactly):
  *
  *  - `bitRows`/`hammingHistogram`: a relational formulation whose bits are
  *    derived from md5 nibbles — chosen because the identical computation is
  *    expressible in DuckDB SQL, which is what makes the simhash query
  *    oracle-checkable (SURVEY §2.14 determinism rules).
  *  - `packed`: a fast path packing the 64 bits into one BIGINT per doc for
  *    banded bucketing at scale.
  *
  * Bit definition: for each distinct whitespace token, md5 -> first 16 hex
  * nibbles -> 64 bits; simhash bit b is 1 iff sum over tokens of
  * (2*bit_b - 1) >= 0.
  */
object SimHash {

  /** (doc_id, pos, sbit): one row per document x bit position. */
  def bitRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
    val bits = toks
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 63), p -> " +
            "(shiftright(instr('0123456789abcdef', substring(md5(tok), (p div 4) + 1, 1)) - 1, " +
            "3 - p % 4) & 1))")))
      .select(col("doc_id"), col("pos"), col("col").as("bit"))
    bits
      .groupBy(col("doc_id"), col("pos"))
      .agg(when(sum(col("bit") * 2 - 1) >= 0, 1).otherwise(0).as("sbit"))
  }

  /** Pairwise Hamming-distance histogram over all doc pairs: (h, n_pairs).
    * Exercises the full sketch pipeline with a bounded output.
    */
  def hammingHistogram(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sim = bitRows(docs, idCol, textCol)
    val a = sim.select(col("doc_id").as("da"), col("pos").as("pa"), col("sbit").as("ba"))
    val b = sim.select(col("doc_id").as("db"), col("pos").as("pb"), col("sbit").as("bb"))
    a.join(b, col("pa") === col("pb") && col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(sum(when(col("ba") =!= col("bb"), 1).otherwise(0)).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Fast path: (doc_id, simhash BIGINT) — same bits packed little-endian
    * (bit 0 = least significant). One narrow aggregation, no explode of
    * pair space; candidate pairs at scale come from banding the 64-bit
    * value into 4x16-bit keys (docs within Hamming distance 3 share at
    * least one band, pigeonhole).
    */
  def packed(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bitRows(docs, idCol, textCol)
      .groupBy(col("doc_id"))
      .agg(sum(expr("shiftleft(CAST(sbit AS BIGINT), pos)")).as("simhash"))
}
