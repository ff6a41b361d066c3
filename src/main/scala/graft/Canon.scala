package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Output canonicalization, mirroring SURVEY.md §2.14 determinism rules.
  *
  * Every declared query's output must hash-match a DuckDB oracle, so:
  *  - money / double aggregates are cast per-value to DECIMAL(18,2) and
  *    summed exactly (order-independent), or rounded post-aggregate;
  *  - final output columns are DOUBLE, never DECIMAL: the exact decimal is
  *    converted once at the edge (`.cast("double")` here, `::DOUBLE` in the
  *    oracle SQL). Decimal->double is the correctly-rounded IEEE conversion
  *    of the same exact rational in both engines, so values stay identical,
  *    while decimal *text* ("253942.00" vs "253942.0") does not survive the
  *    driver's float-repr canonicalization;
  *  - timestamps are rendered as UTC strings;
  *  - row order is a total ORDER BY in both engines.
  */
object Canon {
  val Money: DecimalType = DecimalType(18, 2)

  /** Per-value cast to cents; summing these is exact and order-independent.
    * INTERNAL type — convert with [[out]] before emitting. */
  def money(c: Column): Column = c.cast(Money)

  /** Edge conversion: exact decimal -> final DOUBLE output column. */
  def out(c: Column): Column = c.cast("double")

  /** Exact decimal sum of a double money column, emitted as DOUBLE. */
  def sumMoney(c: Column): Column = out(sum(money(c)))

  /** price * (1 - discount) in exact decimal arithmetic: both operands are
    * cast to decimal BEFORE multiplying, so no engine-specific double
    * rounding can leak into the product (Spark HALF_UP vs DuckDB rounding
    * differ on boundary doubles — seen as cent-level drift at 60k rows).
    */
  def discounted(price: Column, discount: Column): Column =
    money(price) * (lit(1) - discount.cast(DecimalType(18, 4)))

  /** Rounded double aggregate -> decimal -> DOUBLE. The average is snapped
    * to a 6dp decimal grid BEFORE the 2dp round: an exact 2dp tie (e.g.
    * avg = 82/80 = 1.025) sits just below its decimal value in binary, and
    * Spark's Round (canonical-string BigDecimal, sees 1.025 -> 1.03) and
    * DuckDB's round (raw binary 1.02499... -> 1.02) disagree on it. Both
    * engines cast that binary double to DECIMAL(18,6) as exactly 1.025000,
    * and both round the decimal half-up -> 1.03. Oracle SQL must mirror
    * the hop: round(CAST(avg(x) AS DECIMAL(18,6)), 2). */
  def avg2(c: Column): Column =
    out(round(avg(c).cast(DecimalType(18, 6)), 2).cast(Money))

  /** Round + snap to a decimal grid at arbitrary scale; INTERNAL decimal
    * form — safe to `sum()` exactly. Convert with [[out]] at the edge. */
  def decIn(c: Column, scale: Int): Column = round(c, scale).cast(DecimalType(18, scale))

  /** Round + snap to a decimal grid at arbitrary scale, emitted as DOUBLE. */
  def dec(c: Column, scale: Int): Column = out(decIn(c, scale))

  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
