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

  test("plan: no cartesian product, rank comes from range partitioning") {
    val plan = SimHash
      .sortedNeighborhoodPairs(tables.documents, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("rangepartitioning"), plan.take(2000))
  }
}
