package graft.operators

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingStatsSpec extends SparkSpec {

  // the quantile_cont convention the operator pins (spec-local oracle)
  private def qc(sorted: Array[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val frac = pos - lo
    val hi = math.min(lo + 1, sorted.length - 1)
    sorted(lo) * (1.0 - frac) + sorted(hi) * frac
  }

  test("dimRobustStats == per-dim sort-and-interpolate, bit-exact, with ties") {
    import spark.implicits._
    val rnd = new Random(31)
    // dims with different distributions; dim 2 is heavily tied
    val rows = (0 until 257).map { i =>
      (i.toLong, Array(
        rnd.nextDouble().toFloat,
        (rnd.nextGaussian() * 3 + 1).toFloat,
        (rnd.nextInt(4) * 0.5).toFloat,
        if (i % 13 == 0) 50f else rnd.nextDouble().toFloat)) // outliers in dim 3
    }
    val df = rows.toDF("vec_id", "embedding").repartition(7)
    val got = EmbeddingStats.dimRobustStats(df, "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))

    val want = (0 until 4).map { d =>
      val vs = rows.map(_._2(d).toDouble).sorted.toArray
      val (p25, p50, p75) = (qc(vs, 0.25), qc(vs, 0.5), qc(vs, 0.75))
      val (fLo, fHi) = (p25 - 1.5 * (p75 - p25), p75 + 1.5 * (p75 - p25))
      (d.toLong, vs.length.toLong, p25, p50, p75,
        vs.count(v => v < fLo || v > fHi).toLong)
    }
    assert(got.toSeq == want)
    assert(got.exists(_._6 > 0)) // the planted outliers are counted
  }

  test("single-vector and two-vector edge cases interpolate correctly") {
    import spark.implicits._
    val df = Seq((1L, Array(2f, -4f))).toDF("vec_id", "embedding")
    val one = EmbeddingStats.dimRobustStats(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(one.toSeq == Seq((0L, 2.0, 2.0, 2.0), (1L, -4.0, -4.0, -4.0)))

    val df2 = Seq((1L, Array(0f)), (2L, Array(1f))).toDF("vec_id", "embedding")
    val two = EmbeddingStats.dimRobustStats(df2, "vec_id", "embedding")
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(two.toSeq == Seq((0.25, 0.5, 0.75)))
  }

  test("plan: ranks come from range partitioning, no per-dim value collection") {
    val plan = EmbeddingStats
      .dimRobustStats(tables.embeddings, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(2000))
    assert(!plan.contains("Percentile"), plan.take(2000))
  }
}
