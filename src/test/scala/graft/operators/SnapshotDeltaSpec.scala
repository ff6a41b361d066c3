package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing (q118). */
class SnapshotDeltaSpec extends SparkSpec {

  import spark.implicits._

  private val a = Seq(
    (1L, "alpha", "s1"), (2L, "beta", "s1"), (3L, "gamma", "s2"),
  ).toDF("doc_id", "text", "source")
  private val b = Seq(
    (1L, "alpha", "s1"),        // retained
    (2L, "beta edited", "s1"),  // changed (+7 chars)
    (9L, "brand new", "s2"),    // added
  ).toDF("doc_id", "text", "source") // 3L removed

  test("added/removed/changed/retained classified with char deltas") {
    val out = SnapshotDelta.delta(a, b, "doc_id", "text", Seq("source"))
      .orderBy($"doc_id")
      .as[(Long, String, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "s1", "retained", 0),
      (2L, "s1", "changed", 7),
      (3L, "s2", "removed", -5),
      (9L, "s2", "added", 9)))
  }

  test("the diff join carries fingerprints, not document text") {
    val plan = SnapshotDelta.delta(a, b, "doc_id", "text")
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    // no join input exposes the raw text column — both sides were
    // projected to (id, md5, length) before the shuffle
    assert(joins.forall(_.children.forall(
      _.output.forall(_.name != "text"))))
  }
}
