package graft.operators

import scala.util.Random

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  test("misraGries: every key with count > n/capacity survives (adversarial mixes)") {
    val rnd = new Random(7)
    for (cap <- Seq(4, 16, 64)) {
      // heavy keys buried in a uniform tail, shuffled
      val heavy = (0 until 3).flatMap(i => Seq.fill(400 * (i + 1))(s"heavy$i"))
      val tail = (0 until 2000).map(i => s"tail${rnd.nextInt(1500)}")
      val stream = rnd.shuffle(heavy ++ tail)
      val n = stream.size
      val truth = stream.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val surv = HeavyHitters.misraGries(stream.iterator, cap).keySet
      assert(surv.size <= cap)
      val must = truth.filter(_._2 > n.toLong / cap).keySet
      assert(must.subsetOf(surv), s"cap=$cap missing ${must -- surv}")
    }
  }

  test("exactTopK == the full groupBy spelling on a skewed multi-partition corpus") {
    import spark.implicits._
    val rnd = new Random(13)
    val rows = (0 until 20000).map { i =>
      if (i % 3 == 0) s"hot${i % 17}" else s"cold${rnd.nextInt(8000)}"
    }
    val df = rows.toDF("key").repartition(16)
    def want(k: Int) = df.groupBy($"key".as("tok")).agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok").limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // k inside the certificate: the 17 hot keys (~392 each) all clear
    // N/capacity = 78, so capacity 256 certifies exactness
    val got17 = HeavyHitters.exactTopK(df, "key", k = 17, capacity = 256)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got17 == want(17))
    assert(want(17).last._2 > rows.size.toLong / 256) // the certificate itself
    // k BEYOND the certificate (rank 18+ is tail noise at count ~6) is
    // exact only with capacity >= vocabulary, where MG never decrements
    val got25 = HeavyHitters.exactTopK(df, "key", k = 25, capacity = 10000)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got25 == want(25))
  }

  test("exactTopK plan: recount is a broadcast semi-join, no vocabulary-wide join") {
    import spark.implicits._
    val toks = tables.documents
      .select(explode(TextFunctions.alphaTokens($"text")).as("key"))
    // the lazy recount plan (exactTopK itself now collects the k rows to
    // run the N/capacity certificate, returning a local frame)
    val keys = toks.select($"key".cast("string").as("key")).as[String]
    val cands = keys.toDF("key").distinct()
    val plan = HeavyHitters.recountTopK(cands, keys, k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(plan.contains("Broadcast"), plan.take(2000))
  }

  test("exactTopK with fewer than k distinct keys returns all of them (exhaustive-candidate certificate)") {
    import spark.implicits._
    // 7 distinct keys, k=20: the N/capacity certificate can't fire (no
    // 20th row), but no partition ever decrements at capacity 64, so
    // the candidate set is provably complete and the answer exact
    val rows = (0 until 700).map(i => s"k${i % 7}")
    val df = rows.toDF("key").repartition(4)
    val got = HeavyHitters.exactTopK(df, "key", k = 20, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = df.groupBy($"key".as("tok")).agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want && got.length == 7)
  }

  test("exactTopK throws (not silently wrong) when the certificate fails") {
    import spark.implicits._
    // near-uniform: 3000 distinct keys, ~6 each; capacity 8 per partition
    // drops almost everything, and the 5th count (~6) <= N/8
    val rows = (0 until 18000).map(i => s"u${i % 3000}")
    val df = rows.toDF("key").repartition(4)
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exactTopK(df, "key", k = 5, capacity = 8)
    }
    assert(e.getMessage.contains("capacity"), e.getMessage)
  }
}
