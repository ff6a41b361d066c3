package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.5 J7): for each left row, attach the single
  * right row with the greatest `rightTime <= leftTime` within the same key,
  * ties broken by `rightTieBreak` (greatest wins) so results are
  * deterministic.
  *
  * Spark has no native as-of primitive; the idiomatic composition is an
  * equi-join on the key (one shuffle, hash/sort-merge — the range predicate
  * rides along as a join filter, never a nested loop) followed by a
  * row_number window keyed by the left row id. Both the join and the window
  * shuffle hash-partition, and AQE handles skewed keys. At 100 TB the
  * equi-join keeps this linear in matched pairs; if the per-key fan-out is
  * huge, pre-bucket `right` by time (join on (key, time_bucket)) before
  * calling this.
  */
object AsOfJoin {

  /** Left-outer as-of: unmatched left rows survive with null right columns. */
  def latest(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      rightTieBreak: Column,
      leftRowKey: Column,
  ): DataFrame = {
    val joined = left.join(right, leftKey === rightKey && rightTime <= leftTime, "left")
    val w = Window.partitionBy(leftRowKey)
      .orderBy(rightTime.desc_nulls_last, rightTieBreak.desc_nulls_last)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
