package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-document exact paragraph dedup, first-occurrence-wins (q116). */
class ParagraphDedupSpec extends SparkSpec {

  import spark.implicits._

  // wordsPerPara = 2 keeps the fixtures readable: paragraphs are
  // consecutive 2-word windows, last one ragged.
  private val docs = Seq(
    (1L, "a b c d e"),        // paras: "a b", "c d", "e"
    (2L, "a b x y"),          // "a b" is a later copy of doc 1's
    (3L, "c d c d"),          // both paras copy doc 1's "c d"
    (4L, "fresh words here"), // no copies
  ).toDF("doc_id", "text")

  test("paragraphs: fixed word windows with ragged tail, indexed in order") {
    val p = ParagraphDedup.paragraphs(docs, "doc_id", "text", 2)
      .orderBy($"doc_id", $"idx").as[(Long, Int, String)].collect().toSeq
    assert(p.filter(_._1 == 1L).map(_._3) == Seq("a b", "c d", "e"))
    assert(p.filter(_._1 == 4L).map(_._3) == Seq("fresh words", "here"))
  }

  test("first occurrence survives; every later verbatim copy is dropped") {
    val out = ParagraphDedup
      .stripFirstOccurrence(docs, "doc_id", "text", 2)
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 3L, 0L, "a b c d e")))   // first in corpus order
    assert(byId(2L) == ((2L, 2L, 1L, "x y")))         // "a b" dropped
    assert(byId(3L) == ((3L, 2L, 2L, "")))            // fully deduplicated
    assert(byId(4L) == ((4L, 2L, 0L, "fresh words here")))
  }

  test("within-doc repeats also dedup to the first index") {
    val d = Seq((7L, "p q p q p q")).toDF("doc_id", "text")
    val out = ParagraphDedup.stripFirstOccurrence(d, "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].collect().head
    assert(out == ((7L, 3L, 2L, "p q")))
  }

  test("carry columns ride through; empty-text doc survives with 0 paras") {
    val d = Seq((1L, "a b", "s1"), (2L, "  ", "s2")).toDF("doc_id", "text", "src")
    val out = ParagraphDedup
      .stripFirstOccurrence(d, "doc_id", "text", 2, carryCols = Seq("src"))
      .orderBy($"doc_id").as[(Long, String, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, "s1", 1L, 0L, "a b"), (2L, "s2", 0L, 0L, "")))
  }

  test("corpus-order survivorship is deterministic under re-partitioning") {
    val shuffled = docs.repartition(7, $"text")
    val a = ParagraphDedup.stripFirstOccurrence(docs, "doc_id", "text", 2)
      .orderBy($"doc_id").collect().toSeq
    val b = ParagraphDedup.stripFirstOccurrence(shuffled, "doc_id", "text", 2)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }
}
