package graft.operators

import graft.SparkSpec

/** Cross-document boilerplate line removal (q89). */
class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "FOOTER\nalpha beta\nFOOTER2"),
    (2L, "FOOTER\ngamma delta\nFOOTER2"),
    (3L, "FOOTER\nepsilon\nFOOTER2"),
    (4L, "FOOTER\nzeta"),          // FOOTER2 only in 3 docs
    (5L, "RARE\nshared prose"),
    (6L, "RARE\nshared prose"),    // RARE in exactly 2 docs -> kept at minDocs=3
  ).toDF("doc_id", "text")

  test("lines in >= minDocs distinct docs are stripped; order preserved") {
    val out = LineDedup.strip(docs, "doc_id", "text", minDocs = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // FOOTER (4 docs) and FOOTER2 (3 docs) are boilerplate; RARE (2) is not
    assert(byId(1L) == ((1L, 3L, 2L, "alpha beta")))
    assert(byId(4L) == ((4L, 2L, 1L, "zeta")))
    assert(byId(5L) == ((5L, 2L, 0L, "RARE\nshared prose")))
    assert(byId(6L)._4 == "RARE\nshared prose")
  }

  test("threshold boundary: a line in exactly minDocs docs is removed") {
    val out = LineDedup.strip(docs, "doc_id", "text", minDocs = 4)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // at minDocs=4 only FOOTER (4 docs) is boilerplate; FOOTER2 (3) survives
    assert(byId(1L)._4 == "alpha beta\nFOOTER2")
    assert(byId(4L)._4 == "zeta")
  }

  test("fully-boilerplate doc survives as a row with empty clean_text") {
    val all = Seq(
      (1L, "SAME"), (2L, "SAME"), (3L, "SAME"),
    ).toDF("doc_id", "text")
    val out = LineDedup.strip(all, "doc_id", "text", minDocs = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L, ""), (2L, 1L, 1L, ""), (3L, 1L, 1L, "")))
  }

  test("multi-line reassembly preserves duplicate within-doc lines and gaps") {
    val d = Seq(
      (1L, "BP\nx\nBP\ny\nBP"),
      (2L, "BP\nz"),
      (3L, "BP"),
    ).toDF("doc_id", "text")
    val out = LineDedup.strip(d, "doc_id", "text", minDocs = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // BP occurs 3x within doc 1 but that's one distinct doc per occurrence;
    // all three BP positions are removed, x/y keep their relative order
    assert(out.head == ((1L, 5L, 3L, "x\ny")))
    assert(out(1) == ((2L, 2L, 1L, "z")))
    assert(out(2) == ((3L, 1L, 1L, "")))
  }

  test("stripWithinDoc collapses repeated lines to first occurrence, row-locally") {
    val d = Seq(
      (1L, "a\nb\na\nc\nb\na"),
      (2L, "x\ny"),
      (3L, "solo"),
    ).toDF("doc_id", "text")
    val out = d.select($"doc_id", LineDedup.stripWithinDoc($"text").as("r"))
      .select($"doc_id", $"r.n_lines", $"r.n_removed", $"r.clean_text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 6L, 3L, "a\nb\nc"),
      (2L, 2L, 0L, "x\ny"),
      (3L, 1L, 0L, "solo")))
  }
}
