package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Sketch operator guarantees (q79/q80 operator layer): the CMS one-sided
  * bound, Bloom's no-false-negative contract, and the layout-independence
  * both gates rely on.
  */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private def toks = tables.documents
    .select(explode(TextFunctions.alphaTokens($"text")).as("tok"))

  test("count-min never underestimates, and is deterministic per seed") {
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
    val cms = Sketches.countMin(toks, $"tok", eps = 1e-4, confidence = 0.999)
    val est = Sketches.estimateAll(exact.select($"tok"), "tok", cms)
    val under = exact.join(est, Seq("tok")).filter($"est" < $"n").count()
    assert(under == 0, "CMS must never underestimate — hard guarantee broken")
    // counter merges commute, so a rebuild (different task interleaving)
    // must produce identical estimates
    val cms2 = Sketches.countMin(toks.repartition(7), $"tok", eps = 1e-4, confidence = 0.999)
    val est2 = Sketches.estimateAll(exact.select($"tok"), "tok", cms2)
    assert(est.exceptAll(est2).isEmpty && est2.exceptAll(est).isEmpty,
      "CMS estimates must be independent of partition layout")
  }

  test("bloom filter finds every member; absent-key FPR within envelope") {
    val orders = tables.orders
    val members = orders.select($"o_custkey").distinct().cache()
    val n = members.count()
    val bf = Sketches.bloom(orders, $"o_custkey", n, 0.01)
    val missed = Sketches.mightContain(members, "o_custkey", bf)
      .filter(!$"might_contain").count()
    assert(missed == 0, "Bloom false negative — hard guarantee broken")
    val absent = spark.range(-20000L, 0L).toDF("k")
    val fp = Sketches.mightContain(absent, "k", bf)
      .filter($"might_contain").count()
    assert(fp.toDouble / 20000 <= 0.03,
      s"false-positive rate $fp/20000 above the 3x-fpp envelope")
  }
}
