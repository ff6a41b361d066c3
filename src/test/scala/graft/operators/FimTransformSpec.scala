package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fill-in-the-middle transform (q95). */
class FimTransformSpec extends SparkSpec {

  import spark.implicits._

  test("PSM pieces reconstruct the original document exactly") {
    val docs = tables.documents.limit(100).cache()
    val out = FimTransform.psm(docs, "doc_id", "text", "s")
      .join(docs, "doc_id")
      .select($"doc_id", $"fim_text", $"text", $"cut_a", $"cut_b")
      .as[(Long, String, String, Int, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, fim, text, a, b) =>
      assert(0 <= a && a <= b && b <= text.length, s"doc $id cuts ($a,$b)")
      val m = "(?s)<PRE>(.*)<SUF>(.*)<MID>(.*)".r
      fim match {
        case m(pre, suf, mid) =>
          assert(pre + mid + suf == text, s"doc $id does not reconstruct")
          assert(pre.length == a && mid.length == b - a, s"doc $id piece lengths")
        case _ => fail(s"doc $id: malformed FIM text")
      }
    }
    docs.unpersist()
  }

  test("seeded determinism, and cuts actually vary across documents") {
    val docs = tables.documents.limit(50)
    val a = FimTransform.psm(docs, "doc_id", "text", "x")
      .select($"doc_id", $"cut_a", $"cut_b").as[(Long, Int, Int)].collect().toSet
    val b = FimTransform.psm(docs, "doc_id", "text", "x")
      .select($"doc_id", $"cut_a", $"cut_b").as[(Long, Int, Int)].collect().toSet
    assert(a == b)
    assert(a.map(r => (r._2, r._3)).size > 10, "cut points should vary by doc")
  }
}
