package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering — the data-layout
  * operator behind multi-column file skipping: interleaving the bits of
  * k dimension keys gives ONE sort key whose contiguous ranges are
  * simultaneously range-bounded in EVERY dimension, so files written in
  * z-key order carry tight min/max stats on all z-columns at once and a
  * scan filtered on any of them prunes most files. A plain single-column
  * sort bounds only its own column; at 100 TB the difference is reading
  * one file vs one dimension's full stripe.
  *
  * All bit math is row-local integer arithmetic (the classic
  * mask-spread: x |= x<<8 &c), expressible identically in any engine
  * with shifts and bitwise AND/OR — no UDF, fully codegen'd. The only
  * non-row-local step is dimension normalization (global min/max: one
  * 2k-scalar aggregate) and the final range partition by z-key, which is
  * exactly the shuffle a layout rewrite exists to perform.
  */
object ZOrder {

  /** Spread a 16-bit value's bits to the even positions of a 32-bit word. */
  def spread16(x0: Column): Column = {
    val m1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton interleave of two 16-bit normalized dimensions. */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Normalize a long dimension into [0, 65535] given its global bounds:
    * floor((x-min)*65535 / (max-min)), identical to integer `div` for
    * the in-range inputs ((x-min)*65535 must stay under 2^53 for the
    * double floor to be exact — dimension ranges up to ~2^37, far past
    * any realistic normalized key space). Degenerate (min==max) maps
    * to 0.
    */
  def norm16(x: Column, min: Long, max: Long): Column =
    if (max == min) lit(0L)
    else floor(((x - lit(min)) * lit(65535L)).cast("double") / lit((max - min).toDouble))
      .cast("long")

  /** Append a `__z` Morton key over two long-typed dimension columns
    * (bounds from one scalar aggregate over the input). */
  def withZKey(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val b = df.agg(
      min(xCol).cast("long"), max(xCol).cast("long"),
      min(yCol).cast("long"), max(yCol).cast("long")).head()
    val (x0, x1, y0, y1) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    df.withColumn("__z",
      morton2(norm16(xCol.cast("long"), x0, x1), norm16(yCol.cast("long"), y0, y1)))
  }

  /** The layout rewrite: range-partition by z-key and sort within
    * partitions, so each output file is a contiguous z-range — tight
    * min/max on every z-dimension. `numFiles` maps to target file count.
    */
  def cluster(df: DataFrame, xCol: Column, yCol: Column, numFiles: Int): DataFrame = {
    val keyed = withZKey(df, xCol, yCol)
    keyed.repartitionByRange(numFiles, col("__z")).sortWithinPartitions(col("__z"))
  }
}
