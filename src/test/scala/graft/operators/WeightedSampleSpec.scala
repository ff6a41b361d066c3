package graft.operators

import graft.SparkSpec

/** Deterministic weighted sampling (q91). */
class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  test("deterministic: same seed same sample, different seed different sample") {
    val docs = tables.documents.filter($"n_chars" > 0)
      .select($"doc_id", $"n_chars")
    def ids(seed: String) =
      WeightedSample.take(docs, "doc_id", "n_chars", 20, seed)
        .select($"doc_id").as[Long].collect().toSet
    val a = ids("s1")
    assert(a == ids("s1") && a.size == 20)
    assert(a != ids("s2"))
  }

  test("a dominant weight is always selected; zero-ish weights almost never") {
    val rows = ((1L, 1.0e9) +: (2L to 40L).map(_ -> 1.0)).toDF("id", "w")
    val always = (1 to 20).forall { s =>
      WeightedSample.take(rows, "id", "w", 5, s"seed$s")
        .select($"id").as[Long].collect().contains(1L)
    }
    assert(always, "weight 1e9 of total ~1e9 must win every 5-slot race")
  }

  test("pairwise win rate matches w_i/(w_i+w_j)") {
    // two rows, weights 3:1 -> row A wins P=0.75; count over 60 seeds
    // (deterministic — the seed list is fixed, so this can't flake)
    val df = Seq((1L, 3.0), (2L, 1.0)).toDF("id", "w")
    val wins = (1 to 60).count { s =>
      WeightedSample.take(df, "id", "w", 1, s"t$s")
        .select($"id").as[Long].head() == 1L
    }
    assert(wins > 35 && wins < 55, s"expected ~45/60 wins, got $wins")
  }
}
