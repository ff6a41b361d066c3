package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the data-versioning step an incremental
  * training pipeline runs between two crawls/exports of the same
  * collection: which documents were added, removed, changed in place, or
  * retained verbatim, and how the character volume moved. The delta
  * drives incremental downstream work (only `added`+`changed` re-enter
  * cleaning/dedup; `removed` ids feed tombstones) instead of
  * re-processing the full corpus each refresh.
  *
  * Scale shape: both snapshots are projected to (id, content-md5,
  * content-length, carry...) BEFORE the join, so the single full-outer
  * equi-join on the id shuffles fixed ~50-byte rows, never document
  * text — at 100 TB the diff moves ~fingerprint-table bytes. Change
  * detection is md5 equality (128-bit; false "retained" ~2^-64 per
  * colliding pair), length delta rides the same row.
  */
object SnapshotDelta {

  /** Per-id delta between snapshots `a` (old) and `b` (new):
    * (idCol, carryCols..., status, char_delta) with status in
    * added | removed | changed | retained. `carryCols` are per-doc
    * attributes assumed stable across snapshots (taken from whichever
    * side is present).
    */
  def delta(a: DataFrame, b: DataFrame, idCol: String, contentCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    def fp(df: DataFrame): DataFrame = df.select(
      col(idCol) +: carryCols.map(col) :+
        md5(col(contentCol)).as("__h") :+
        length(col(contentCol)).as("__len"): _*)
    val fa = fp(a).as("a")
    val fb = fp(b).as("b")
    def pick(c: String): Column = coalesce(col(s"a.$c"), col(s"b.$c")).as(c)
    fa.join(fb, col(s"a.$idCol") === col(s"b.$idCol"), "full_outer")
      .select(pick(idCol) +: carryCols.map(pick) :+
        when(col(s"a.$idCol").isNull, "added")
          .when(col(s"b.$idCol").isNull, "removed")
          .when(col("a.__h") =!= col("b.__h"), "changed")
          .otherwise("retained").as("status") :+
        (coalesce(col("b.__len"), lit(0)) - coalesce(col("a.__len"), lit(0)))
          .as("char_delta"): _*)
  }
}
