package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring (q119). */
class ImportanceRatioSpec extends SparkSpec {

  import spark.implicits._

  // target slice speaks "x y"; the general corpus mostly "a b".
  private val docs = Seq(
    (1L, "x y x y", true),
    (2L, "x y a b", false),
    (3L, "a b a b", false),
    (4L, "a b a b", false),
  ).toDF("doc_id", "text", "tgt")

  test("target-like documents score higher than off-target ones") {
    val li = NgramLm.importanceRatio(docs, "text", $"tgt", "doc_id")
      .as[(Long, Double)].collect().toMap
    assert(li(1L) > li(2L))
    // docs 3/4 contain no target-model bigram at all -> absent
    assert(!li.contains(3L) && !li.contains(4L))
  }

  test("li is the mean log count-ratio over shared bigrams") {
    // corpus grams: doc1 {x y, y x, x y}, doc2 {x y, y a, a b},
    // docs 3/4 {a b, b a, a b} each. Target LM (doc1): p(y|x)=1, p(x|y)=1.
    // Shared grams with the target model: "x y" (corpus p = 4/5 — w1=x
    // has 4 "x y" and 1 "x ..."? recount: grams with w1=x: doc1 "x y"x2,
    // doc2 "x y" -> c(x .)=3, c(x y)=3, p=1; w1=y: doc1 "y x", doc2
    // "y a" -> c(y .)=2, c(y x)=1. So lpg("x y")=-ln(1)=0=lpt ->
    // li(doc1) = mean over its shared grams ("x y" x2, "y x" x1):
    // for "y x": lpg=-ln(1/2), lpt=-ln(1/2)... doc1's "y x" IS in the
    // target model (trained on doc1): c_t(y x)=1, c_t(y .)=1 -> lpt=0.
    // li(doc1) = (0 + (ln2 - 0) + 0)/3 = ln2/3.
    val li = NgramLm.importanceRatio(docs, "text", $"tgt", "doc_id")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(li(1L) - math.log(2) / 3) < 1e-12)
  }

  test("scores are invariant under re-partitioning") {
    val a = NgramLm.importanceRatio(docs, "text", $"tgt", "doc_id")
      .orderBy($"doc_id").collect().toSeq
    val b = NgramLm.importanceRatio(docs.repartition(5, $"text"), "text", $"tgt", "doc_id")
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }
}
