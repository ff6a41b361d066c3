package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar functions X1–X3 (SURVEY.md §2.10) as native
  * column expressions — codegen'd `when`/`concat` trees, no black-box UDFs,
  * so Catalyst can fold/prune through them (§2.13 policy).
  */
object ClaimFunctions {

  /** X1 `format_diagnosis_code` (`hcc:167-178`): nil -> nil; E-codes get a
    * '.' inserted at index 4 (E850.9), everything else at index 3 (V54.31,
    * 123.45). The reference inserts unconditionally — a 3-char code "123"
    * becomes "123." — and that behavior is mirrored exactly.
    */
  def formatDiagnosisCode(code: Column): Column =
    when(code.isNull, lit(null).cast("string"))
      .when(code.startsWith("E"),
        concat(substring(code, 1, 4), lit("."), expr_substr(code, 5)))
      .otherwise(
        concat(substring(code, 1, 3), lit("."), expr_substr(code, 4)))

  /** substring-to-end; `substring(c, pos, big)` mirrors Ruby's open slice. */
  private def expr_substr(c: Column, pos: Int): Column = substring(c, pos, 1 << 24)

  /** X2 `format_postal_code` (`hcc:180-186`): 9 digits -> XXXXX-XXXX, else
    * first 5. Null propagates (Ruby's `nil.to_s` edge is represented as null
    * in the engine's tables, not "" — declared in SURVEY §7 step 3).
    */
  def formatPostalCode(zip: Column): Column =
    when(length(zip) === 9,
      concat(substring(zip, 1, 5), lit("-"), substring(zip, 6, 4)))
      .otherwise(substring(zip, 1, 5))

  /** X3 `get_name` (`hcc:221-227`): entity type '1' (person) ->
    * "Last, First[, M]" (middle initial only), else the org name. Absent
    * middle contributes nothing; an absent NM1 yields null throughout.
    */
  def getName(entityType: Column, last: Column, first: Column, middle: Column): Column =
    when(entityType === "1",
      concat(
        coalesce(last, lit("")), lit(", "), coalesce(first, lit("")),
        when(middle.isNotNull, concat(lit(", "), substring(middle, 1, 1))).otherwise(lit(""))))
      .otherwise(last)

  /** getName over an Nm1 struct column (entityType/last/first/middle fields). */
  def getName(nm1: Column): Column =
    getName(nm1.getField("entityType"), nm1.getField("last"),
      nm1.getField("first"), nm1.getField("middle"))

  /** CCYYMMDD string -> DateType (engine stores dates typed, SURVEY §1.2). */
  def x12Date(c: Column): Column = to_date(c, "yyyyMMdd")
}
