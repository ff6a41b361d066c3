package graft.operators

import graft.SparkSpec
import graft.fixtures.BpeRef
import org.apache.spark.sql.functions._

/** BPE parity gates: the distributed learner must reproduce the
  * sequential reference's merge list exactly (integer counts + the
  * (count desc, pair lex) tie-break make this deterministic), and both
  * encoders must agree on the corner cases where naive rule-order
  * application diverges from the canonical priority loop.
  */
class BpeSpec extends SparkSpec {

  test("distributed learner reproduces the sequential reference merge list exactly") {
    import spark.implicits._
    val docs = tables.documents.limit(200).cache()
    val refMerges = BpeRef.learnMerges(
      docs.select($"text").as[String].collect(), 30)
    val distMerges = Bpe.learnMerges(Bpe.wordCounts(docs, "text"), 30)
    assert(refMerges.nonEmpty && distMerges == refMerges)
    docs.unpersist()
  }

  test("encoders agree, including when a later merge creates an earlier rule's pair") {
    import spark.implicits._
    // merges: rank0 = (ab, z), rank1 = (a, b). Word "abz": the priority
    // loop first applies rank1 (the only present pair) -> [ab, z], which
    // CREATES rank0's pair -> [abz]. Rule-order-once application would
    // stop at [ab, z] — this pins the canonical semantics.
    val merges = Seq(("ab", "z"), ("a", "b"))
    assert(BpeRef.encode("abz", merges).toSeq == Seq("abz"))
    val df = Seq((1L, "abz abba zab")).toDF("doc_id", "text")
    val out = Bpe.encode(df, "doc_id", "text", merges)
      .select($"tokens_text").as[String].head()
    assert(out == BpeRef.encode("abz abba zab", merges).mkString(" "))
    // overlapping pair occurrences merge left to right: "aaa" + (a,a)
    assert(BpeRef.encode("aaa", Seq(("a", "a"))).toSeq == Seq("aa", "a"))
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
  }

  test("full-corpus encode parity between the distributed and sequential encoders") {
    import spark.implicits._
    val docs = tables.documents.cache()
    val merges = BpeRef.learnMerges(
      docs.filter($"doc_id" < 100).select($"text").as[String].collect(), 40)
    val dist = Bpe.encode(docs, "doc_id", "text", merges)
      .select($"doc_id", $"tokens_text").as[(Long, String)].collect().toMap
    val ref = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> BpeRef.encode(t, merges).mkString(" ") }.toMap
    assert(dist == ref && dist.nonEmpty)
    // merges actually fire: some doc must contain a multi-char token
    assert(dist.values.exists(_.split(" ").exists(_.length > 1)))
    docs.unpersist()
  }
}
