package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Output canonicalization, mirroring SURVEY.md §2.14 determinism rules.
  *
  * Every declared query's output must hash-match a DuckDB oracle, so:
  *  - money / double aggregates are cast per-value to DECIMAL(18,2) and
  *    summed exactly (order-independent), or rounded post-aggregate;
  *  - timestamps are rendered as UTC strings;
  *  - row order is a total ORDER BY in both engines.
  */
object Canon {
  val Money: DecimalType = DecimalType(18, 2)

  /** Per-value cast to cents; summing these is exact and order-independent. */
  def money(c: Column): Column = c.cast(Money)

  /** Exact decimal sum of a double money column. */
  def sumMoney(c: Column): Column = sum(money(c)).cast(Money)

  /** price * (1 - discount) in exact decimal arithmetic: both operands are
    * cast to decimal BEFORE multiplying, so no engine-specific double
    * rounding can leak into the product (Spark HALF_UP vs DuckDB rounding
    * differ on boundary doubles — seen as cent-level drift at 60k rows).
    */
  def discounted(price: Column, discount: Column): Column =
    money(price) * (lit(1) - discount.cast(DecimalType(18, 4)))

  /** Rounded double aggregate -> decimal; only for avg-style results where
    * the FP error (~1e-11 rel) is far below the 2dp rounding grid. */
  def avg2(c: Column): Column = round(avg(c), 2).cast(Money)

  /** Round + cast with an arbitrary scale. */
  def dec(c: Column, scale: Int): Column = round(c, scale).cast(DecimalType(18, scale))

  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
