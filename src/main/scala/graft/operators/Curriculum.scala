package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-order assembly: curriculum interleaving and
  * length-bucketed batch packing. Both are "global rank within a handful
  * of groups" problems — the classic Spark scale trap, because a plain
  * `PARTITION BY source` window serializes each group into ONE task. Both
  * therefore ride [[SequencePacking.keyedPrefixSum]] (range-partitioned
  * two-pass prefix sum), which splits every group across many tasks and
  * is provably layout-independent, so the small-SF oracle and the
  * 1000-executor plan are the same code.
  */
object Curriculum {

  /** Round-robin curriculum interleave: rank documents within each group
    * by (scoreCol DESC, idCol ASC) — "best first" — then assign the
    * global training position `(rank-1) * nGroups + groupIdx`. With
    * equal-sized groups this is a permutation of 0..N-1; with unequal
    * groups positions stay distinct and monotone per group (exhausted
    * groups simply leave gaps), which is exactly the schedule a
    * sequential trainer consuming by ascending position would see.
    *
    * `groupIdxCol` must be a 0-based integer index < nGroups, derivable
    * from the group key (callers parse it from the source name).
    * Output: input columns + `rank` (1-based within group) + `position`.
    */
  def interleave(
      df: DataFrame, groupCol: String, groupIdxCol: Column,
      scoreCol: Column, idCol: String, nGroups: Int): DataFrame = {
    require(nGroups >= 1, s"nGroups must be >= 1, got $nGroups")
    // guard the index contract row-locally: an out-of-range group index
    // would otherwise produce silently colliding / non-monotone
    // positions — the worst failure mode for a training schedule. A
    // raise_error inside the position expression costs nothing on valid
    // input (codegen'd conditional) and fails LOUDLY on the first bad row.
    val gidx = col("__gidx")
    val checked = when(gidx.isNull || gidx < 0 || gidx >= nGroups,
      raise_error(concat(lit(s"Curriculum.interleave: group index out of [0, $nGroups) for "),
        col(idCol).cast("string")))).otherwise(gidx)
    val ranked = SequencePacking.keyedPrefixSum(
      df.withColumn("__gidx", groupIdxCol.cast("long")),
      Seq(groupCol), Seq(scoreCol.desc, col(idCol)), lit(1L), "__before")
    ranked
      .withColumn("rank", col("__before") + 1L)
      .withColumn("position", col("__before") * nGroups + checked)
      .drop("__before", "__gidx")
  }

  /** Length-bucketed batch packing (the padding-efficiency transform:
    * batching similar-length sequences bounds pad waste): each document
    * goes to the bucket `pad_len` = smallest power of two >= its token
    * count (clamped to [minPad, maxPad]); within a bucket, documents are
    * packed `docsPerBatch` at a time in idCol order. Buckets and batch
    * ids are exact integer arithmetic — no float log2, whose
    * `ln(x)/ln(2)` spelling rounds differently across engines exactly at
    * the power-of-two boundaries that define the buckets.
    *
    * Output: input columns + `pad_len` + `batch_id` (0-based within
    * bucket).
    */
  def lengthBucketPack(
      df: DataFrame, idCol: String, nTokCol: Column,
      docsPerBatch: Int, minPad: Int = 16, maxPad: Int = 1024): DataFrame = {
    require(docsPerBatch >= 1, s"docsPerBatch must be >= 1, got $docsPerBatch")
    require(minPad >= 1 && Integer.bitCount(minPad) == 1 &&
      Integer.bitCount(maxPad) == 1 && maxPad >= minPad,
      s"pad bounds must be powers of two, got [$minPad, $maxPad]")
    // CASE ladder over the power-of-two thresholds: exact in any engine
    val pads = Iterator.iterate(minPad)(_ * 2).takeWhile(_ <= maxPad).toSeq
    val padLen = pads.init.foldRight(lit(pads.last): Column) {
      (p, rest) => when(nTokCol <= p, lit(p)).otherwise(rest)
    }
    val bucketed = df.withColumn("pad_len", padLen)
    SequencePacking.keyedPrefixSum(
      bucketed, Seq("pad_len"), Seq(col(idCol)), lit(1L), "__before")
      .withColumn("batch_id", expr(s"__before DIV $docsPerBatch"))
      .drop("__before")
  }
}
