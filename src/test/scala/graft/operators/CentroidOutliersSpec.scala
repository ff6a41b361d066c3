package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-label centroid cohesion + outlier ranking (q117). */
class CentroidOutliersSpec extends SparkSpec {

  import spark.implicits._

  private val emb = Seq(
    (1L, 0, Seq(1.0f, 0.0f)),
    (2L, 0, Seq(1.0f, 0.1f)),
    (3L, 0, Seq(0.9f, 0.0f)),
    (4L, 0, Seq(-1.0f, 0.0f)),  // opposes the label-0 cluster
    (5L, 1, Seq(0.0f, 1.0f)),
    (6L, 1, Seq(0.0f, 2.0f)),
  ).toDF("vec_id", "label", "embedding")

  test("the opposing vector ranks as the label's worst outlier") {
    val out = SimilaritySearch
      .centroidOutliers(emb, "vec_id", "embedding", "label")
      .orderBy($"label", $"rn")
      .select($"label", $"vid", $"rn", $"cos")
      .as[(Int, Long, Int, Double)].collect().toSeq
    val l0 = out.filter(_._1 == 0)
    assert(l0.head._2 == 4L && l0.head._3 == 1)   // rn=1 = least central
    assert(l0.head._4 < 0)                        // opposes the centroid
    assert(l0.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
    // colinear label-1 vectors are both fully central
    assert(out.filter(_._1 == 1).forall(_._4 == 1.0))
  }

  test("centroid is the exact per-dimension mean (decimal-summed)") {
    // label 1 centroid = (0, 1.5); cos of (0,1) to it = 1
    val cos5 = SimilaritySearch
      .centroidOutliers(emb.filter($"label" === 1), "vec_id", "embedding", "label")
      .filter($"vid" === 5L).select($"cos").as[Double].head()
    assert(cos5 == 1.0)
  }

  test("ranking is invariant under re-partitioning (order-independent sums)") {
    val a = SimilaritySearch.centroidOutliers(emb, "vec_id", "embedding", "label")
      .orderBy($"label", $"rn").collect().toSeq
    val b = SimilaritySearch
      .centroidOutliers(emb.repartition(5, $"vec_id"), "vec_id", "embedding", "label")
      .orderBy($"label", $"rn").collect().toSeq
    assert(a == b)
  }
}
