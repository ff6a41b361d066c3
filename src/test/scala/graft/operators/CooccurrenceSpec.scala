package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class CooccurrenceSpec extends SparkSpec {

  private def brute(
      docs: Seq[String], minCount: Long, topN: Int): Seq[(String, String, Long, Long)] = {
    val bigrams = docs.flatMap { t =>
      val toks = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      toks.zip(toks.drop(1))
    }
    val pc = bigrams.groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
    val n = pc.values.sum
    val lm = pc.groupBy(_._1._1).map { case (l, xs) => (l, xs.values.sum) }
    val rm = pc.groupBy(_._1._2).map { case (r, xs) => (r, xs.values.sum) }
    pc.toSeq
      .filter(_._2 >= minCount)
      .map { case ((l, r), np) =>
        val lift = (BigInt(np) * n * 1000000L) / (BigInt(lm(l)) * rm(r))
        (l, r, np, lift.toLong)
      }
      .sortBy { case (l, r, np, _) => (-np, l, r) }
      .take(topN)
  }

  test("bigramLift matches a brute-force computation, ties and all") {
    import spark.implicits._
    // "of the" is a strong collocation; "the of" never occurs; singletons
    // fall below minCount; repeated docs force count ties at the cut.
    val docs = Seq.fill(4)("the cat sat on the mat of the house") ++
      Seq.fill(3)("a house of the cat, a mat!") ++
      Seq("rare words appear once only", "of of of the the")
    val got = Cooccurrence
      .bigramLift(docs.toDF("text"), TextFunctions.alphaTokens($"text"),
        minCount = 2L, topN = 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == brute(docs, 2L, 8))
  }

  test("bigramLift: docs with <2 tokens contribute nothing, empty input yields empty") {
    import spark.implicits._
    val docs = Seq("solo", "", "  ", "x y x y x y")
    val got = Cooccurrence
      .bigramLift(docs.toDF("text"), TextFunctions.alphaTokens($"text"),
        minCount = 1L, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // bigrams: (x,y) x3, (y,x) x2; N=5
    assert(got.toSeq == brute(Seq("x y x y x y"), 1L, 10))
    val empty = Cooccurrence
      .bigramLift(Seq("a", "").toDF("text"), TextFunctions.alphaTokens($"text"),
        minCount = 1L, topN = 10)
      .count()
    assert(empty == 0L)
  }

  test("vocabOverlap: pairwise vocab Jaccard matches set arithmetic, all group shapes") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x y z"), ("a", "w"),          // vocab(a) = {w,x,y,z}
      ("b", "x y"),                        // vocab(b) = {x,y}
      ("c", "q r s t"),                    // disjoint from a,b
      ("d", "x y z w")                     // identical to a
    ).toDF("source", "text")
    val got = Cooccurrence.vocabOverlap(docs, $"source", TextFunctions.alphaTokens($"text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val vocab = Map(
      "a" -> Set("w", "x", "y", "z"), "b" -> Set("x", "y"),
      "c" -> Set("q", "r", "s", "t"), "d" -> Set("w", "x", "y", "z"))
    val want = (for {
      sa <- vocab.keys; sb <- vocab.keys if sa < sb
      i = (vocab(sa) intersect vocab(sb)).size.toLong if i > 0
      u = (vocab(sa) union vocab(sb)).size.toLong
    } yield (sa, sb, i, i * 1000000L / u)).toSeq.sorted
    assert(got == want)
    // disjoint pairs (c vs all) are absent, not zero rows
    assert(!got.exists { case (x, y, _, _) => x == "c" || y == "c" })
  }

  test("bigramLift plan: bigrams are row-local and the pair count partial-aggregates") {
    import spark.implicits._
    val plan = Cooccurrence
      .bigramLift(tables.documents, TextFunctions.alphaTokens($"text"),
        minCount = 5L, topN = 100)
      .queryExecution.executedPlan.toString
    // no positional self-join anywhere in the plan; partial agg before shuffle
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("partial"), plan.take(2000))
  }
}
