package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {

  test("sortedNeighborhoodPairs == the one-task row_number spelling") {
    import spark.implicits._
    val docs = tables.documents
    val got = SimHash
      .sortedNeighborhoodPairs(docs, "doc_id", "text", window = 6, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val rk = SimHash.packed(docs, "doc_id", "text")
      .withColumn("rnk",
        row_number().over(Window.orderBy($"hi", $"lo", $"doc_id")).cast("long"))
    val a = rk.select($"doc_id".as("ia"), $"lo".as("la"), $"hi".as("ha"), $"rnk".as("ra"))
    val b = rk.select($"doc_id".as("ib"), $"lo".as("lb"), $"hi".as("hb"), $"rnk".as("rb"))
    val want = a.join(b, $"rb" > $"ra" && $"rb" <= $"ra" + 6)
      .select(least($"ia", $"ib").as("da"), greatest($"ia", $"ib").as("db"),
        (bit_count($"la".bitwiseXOR($"lb")) +
          bit_count($"ha".bitwiseXOR($"hb"))).cast("long").as("h"))
      .filter($"h" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got.nonEmpty && got == want)
  }

  test("exact duplicate docs are always adjacent in sort order and reported at h=0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "totally different words here entirely unrelated content"),
      (4L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = SimHash
      .sortedNeighborhoodPairs(docs, "doc_id", "text", window = 2, maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical signatures sort adjacent: all three dup pairs fit in window 2
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("rotated passes: superset of single-pass, subset of all-pairs, identical h") {
    import spark.implicits._
    val docs = tables.documents
    def pairSet(rot: Int) = SimHash
      .sortedNeighborhoodPairsRotated(docs, "doc_id", "text",
        window = 6, maxDist = 3, rotations = rot)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val r1 = pairSet(1); val r2 = pairSet(2); val r4 = pairSet(4)
    assert(r1.subsetOf(r2) && r2.subsetOf(r4)) // monotone recall
    assert(r2.size > r1.size)                  // the second ordering earns its pass

    // ground truth: all-pairs Hamming <= 3 on the same signatures
    val p = SimHash.packed(docs, "doc_id", "text")
    val a = p.select($"doc_id".as("ia"), $"lo".as("la"), $"hi".as("ha"))
    val b = p.select($"doc_id".as("ib"), $"lo".as("lb"), $"hi".as("hb"))
    val all = a.join(b, $"ia" < $"ib")
      .select($"ia", $"ib",
        (bit_count($"la".bitwiseXOR($"lb")) +
          bit_count($"ha".bitwiseXOR($"hb"))).cast("long").as("h"))
      .filter($"h" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r4.subsetOf(all)) // no false pairs, h values exact
  }

  test("rotl moves every 16-bit band through the sort-significant top") {
    import spark.implicits._
    // two sigs differing ONLY in bit 63: maximally separated in the
    // natural order, adjacent after any rotation that moves bit 63 down
    val docs = Seq(
      (1L, 0L, 0x80000000L), // hi bit 63 set
      (2L, 0L, 0x00000000L),
      (3L, 0x12345678L, 0x7fffffffL) // a distant third party
    ).toDF("doc_id", "lo", "hi")
    // direct check through the public surface: build fake "packed" docs
    // via a view over the operator's private pass is not exposed, so we
    // assert the rotation algebra instead: rotating 4x16 returns home
    val sig = docs.select($"doc_id", $"lo", $"hi")
    val roundTrip = (0 until 4).foldLeft(sig) { (d, _) =>
      d.select($"doc_id",
        (shiftleft($"lo", 16).bitwiseAND(lit(0xffffffffL)))
          .bitwiseOR(shiftright($"hi", 16)).as("lo"),
        (shiftleft($"hi", 16).bitwiseAND(lit(0xffffffffL)))
          .bitwiseOR(shiftright($"lo", 16)).as("hi"))
    }
    assert(roundTrip.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      sig.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("plan: no cartesian product, rank comes from range partitioning") {
    val plan = SimHash
      .sortedNeighborhoodPairs(tables.documents, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("rangepartitioning"), plan.take(2000))
  }
}
