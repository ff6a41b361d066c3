package graft.operators

import graft.SparkSpec

/** T5-style span corruption (q94). */
class SpanCorruptionSpec extends SparkSpec {

  import spark.implicits._

  test("sentinels number runs in order; target carries exactly the dropped spans") {
    val out = SpanCorruption.denoise(
      tables.documents, "doc_id", "text", seed = "9")
      .as[(Long, Long, Long, Long, String, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nTok, nMask, nSpans, masked, target) =>
      assert(nMask <= nTok, s"doc $id")
      assert(nSpans <= nMask, s"doc $id: every span has >= 1 masked token")
      // sentinel sequence in the input must be 0,1,2,... exactly nSpans long
      val sentinels = "<extra_id_(\\d+)>".r.findAllMatchIn(masked).map(_.group(1).toInt).toSeq
      assert(sentinels == (0 until nSpans.toInt), s"doc $id: $sentinels")
      // the target opens with sentinel 0 iff anything was masked, and
      // carries each sentinel exactly once, in order
      val tgtSent = "<extra_id_(\\d+)>".r.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(tgtSent == (0 until nSpans.toInt), s"doc $id target: $tgtSent")
      // token conservation: unmasked tokens in input + masked tokens in
      // target = original token count (sentinels excluded on both sides)
      def nonSentinelTokens(s: String): Long =
        s.split(" ").count(t => t.nonEmpty && !t.startsWith("<extra_id_")).toLong
      assert(nonSentinelTokens(masked) + nonSentinelTokens(target) == nTok, s"doc $id")
    }
    // the corpus-level mask rate should be near p=0.15
    val (tot, msk) = out.foldLeft((0L, 0L)) { case ((t, m), r) => (t + r._2, m + r._3) }
    val rate = msk.toDouble / tot
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate")
  }

  test("deterministic in the seed") {
    val docs = tables.documents.limit(20)
    val a = SpanCorruption.denoise(docs, "doc_id", "text", "s1")
      .select($"doc_id", $"masked_text").as[(Long, String)].collect().toMap
    val b = SpanCorruption.denoise(docs, "doc_id", "text", "s1")
      .select($"doc_id", $"masked_text").as[(Long, String)].collect().toMap
    val c = SpanCorruption.denoise(docs, "doc_id", "text", "s2")
      .select($"doc_id", $"masked_text").as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a != c)
  }
}
