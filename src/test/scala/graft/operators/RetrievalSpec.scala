package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 retrieval, int8 quantization, and n-gram LM scoring — the
  * retrieval/embedding operator family backing q70/q71/q72.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("Bm25.topK: idf favors rare terms, tf saturates, short docs win ties") {
    // 4 docs; "rare" in one doc, "common" in three. k1=1.2, b=0.75.
    val docs = Seq(
      (1L, "common rare common x y"),
      (2L, "common a b c d"),
      (3L, "common common common common e"),
      (4L, "zz yy xx ww vv"),
    ).toDF("doc_id", "text")
    val out = Bm25.topK(docs, "doc_id", "text", Seq("rare", "common"), 10)
      .orderBy($"term", $"rnk")
      .select($"term", $"rnk", $"doc_id", $"score")
      .as[(String, Long, Long, Double)].collect().toSeq
    val rare = out.filter(_._1 == "rare")
    val common = out.filter(_._1 == "common")
    assert(rare.map(_._3) == Seq(1L), "only doc 1 contains 'rare'")
    assert(common.map(_._3).toSet == Set(1L, 2L, 3L))
    // idf: rare (df=1) must outscore common (df=3) at equal tf/dl
    assert(rare.head._4 > common.filter(_._3 == 2L).head._4)
    // tf saturation with length norm: doc 3 (tf=4, dl=5) beats doc 2 (tf=1, dl=5)
    val byDoc = common.map(t => t._3 -> t._4).toMap
    assert(byDoc(3L) > byDoc(2L))
    // hand-check doc 2's score: tf=1, dl=5, avgdl=5, N=4, df=3
    val idf = math.log(1.0 + (4.0 - 3.0 + 0.5) / (3.0 + 0.5))
    val expected = idf * 1.0 * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 5.0 / 5.0))
    assert(math.abs(byDoc(2L) - expected) < 1e-12)
  }

  test("PhraseSearch: adjacency, order, overlap, and normalization on a hand corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the Quick brown-fox. quick brown again"), // normalization: case + punct
      (2L, "quick stop brown"),                       // both tokens, NOT adjacent
      (3L, "brown quick"),                            // adjacent, wrong order
      (4L, "go go go")                                // repeated-token overlap
    ).toDF("doc_id", "text")
    val post = graft.operators.PhraseSearch.postings(docs, "doc_id", "text")
    val m = graft.operators.PhraseSearch.search(post,
        Seq(0 -> Seq("quick", "brown"), 1 -> Seq("go", "go"), 2 -> Seq("quick", "brown", "again")))
      .collect().map(r => (r.getAs[Int]("pid"), r.getAs[Long]("doc_id"), r.getAs[Long]("start")))
      .toSet
    assert(m == Set(
      (0, 1L, 2L), (0, 1L, 5L), // "quick brown" twice in doc 1 (case/punct folded)
      (1, 4L, 1L), (1, 4L, 2L), // "go go" OVERLAPS in "go go go": starts 1 and 2
      (2, 1L, 5L)               // 3-token phrase only at the second occurrence
    ))
  }

  test("int8 quantization: codes bounded, reconstruction within half a step") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    val v = graft.functions.VectorFunctions.toDouble($"embedding")
    val checked = emb
      .select(v.as("v"), Quantization.int8Scale(v).as("s"))
      .filter($"s" > 0)
      .withColumn("q", Quantization.int8Codes($"v", $"s"))
      .withColumn("rec", Quantization.dequantize($"q", $"s"))
      .select(
        array_max(transform($"q", x => abs(x))).as("qmax"),
        array_max(expr("zip_with(v, rec, (a, b) -> abs(a - b))")).as("err"),
        ($"s" / 2 + lit(1e-12)).as("half_step"))
    assert(checked.filter($"qmax" > 127).isEmpty, "codes must fit int8")
    assert(checked.filter($"err" > $"half_step").isEmpty,
      "reconstruction error must be <= s/2 per element")
  }

  test("NgramLm: MLE bigram probabilities on a hand-computable corpus") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "x")).toDF("doc_id", "text")
    val lm = NgramLm.bigramLm(docs, "text")
    val got = lm.as[(String, Double)].collect().toMap
    // c(a·)=2, c(a b)=c(a c)=1 -> lp = ln 2 for both; doc 3 has no bigrams
    assert(got.keySet == Set("a b", "a c"))
    assert(math.abs(got("a b") - math.log(2.0)) < 1e-15)
    val ce = NgramLm.crossEntropy(docs, "text", lm, "doc_id")
      .as[(Long, Double)].collect().toMap
    assert(ce.keySet == Set(1L, 2L))
    assert(math.abs(ce(1L) - math.log(2.0)) < 1e-15)
  }
}
