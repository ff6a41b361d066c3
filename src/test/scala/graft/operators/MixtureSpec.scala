package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DomainMixture quota arithmetic and sampling, plus the round-4 corpus
  * signals: cross-document shared-gram stats and fuzzy decontamination
  * (q74/q75/q76 operator layer).
  */
class MixtureSpec extends SparkSpec {

  import spark.implicits._

  test("quotas: integer largest-remainder, Σ quota == total exactly") {
    // n = {100, 9, 4} -> weights {10, 3, 2}, S = 15, T = 10:
    // quota0 = {6, 2, 1} (rem {10, 0, 5}), one leftover seat -> largest
    // remainder (source a) gets it: {7, 2, 1}
    val docs = (
      (1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 109).map(i => (i.toLong, "b")) ++
      (110 to 113).map(i => (i.toLong, "c"))
    ).toDF("doc_id", "src")
    val q = DomainMixture.quotas(docs, "src", 10L)
      .orderBy($"source")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(q == Seq(("a", 100L, 10L, 7L), ("b", 9L, 3L, 2L), ("c", 4L, 2L, 1L)))
  }

  test("quotas sum to the requested total on the corpus, any total") {
    val docs = tables.documents
    for (total <- Seq(7L, 37L, 200L)) {
      val s = DomainMixture.quotas(docs, "source", total)
        .agg(sum($"quota")).as[Long].head()
      assert(s == total, s"Σ quota != $total")
    }
  }

  test("sample: per-source size == quota, deterministic across runs") {
    val docs = tables.documents
    val got = DomainMixture.sample(docs, "doc_id", "source", 37L)
      .groupBy($"source", $"quota").agg(count(lit(1)).as("n"))
      .filter($"n" =!= $"quota")
    assert(got.isEmpty, "a source's sample size diverged from its quota")
    val ids1 = DomainMixture.sample(docs, "doc_id", "source", 37L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val ids2 = DomainMixture.sample(docs, "doc_id", "source", 37L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2, "md5-rank selection must be run-deterministic")
  }

  test("crossDocGramStats: distinct grams, cross-doc frequency, short docs") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4"),  // grams: {w1 w2 w3, w2 w3 w4} — first shared with doc 2
      (2L, "w1 w2 w3 x"),   // grams: {w1 w2 w3, w2 w3 x}
      (3L, "one two"),      // too short: no grams
      (4L, "r r r r r"),    // within-doc repetition counts ONCE: {r r r}
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocGramStats(docs, "doc_id", "text", 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 0L, 0L, 0.0), (4L, 1L, 0L, 0.0)))
  }

  test("fuzzyContaminatedIds flags near-dup train docs, never eval docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (2L, base),                                   // eval (id % 2 == 0)
      (3L, base + " x"),                            // train near-copy -> flagged
      (5L, "completely unrelated text about spark physical plans and shuffles"),
      (4L, base + " y"),                            // eval near-copy of eval: not a train doc
    ).toDF("doc_id", "text")
    val got = Decontamination
      .fuzzyContaminatedIds(docs, "doc_id", "text", $"doc_id" % 2 === 0, 0.7)
      .as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("clusteredNearDuplicates ⊆ exact pairs, recall above the gate floor") {
    val e = tables.embeddings
    val exact = SimilaritySearch
      .nearDuplicates(e, "vec_id", "embedding", 0.45)
      .select($"ka", $"kb")
    val sem = SimilaritySearch
      .clusteredNearDuplicates(spark, e, "vec_id", "embedding", 0.45, nLists = 8)
      .select($"ka", $"kb")
    assert(sem.exceptAll(exact).isEmpty,
      "cell-local pairs must be a subset of the exact pair set (exact refine)")
    val nExact = exact.count()
    val hits = exact.join(sem, Seq("ka", "kb")).count()
    assert(nExact > 0, "fixture corpus must contain near-dup pairs at 0.45")
    // q77 gates >= 0.5; assert the same floor here so a recall regression
    // fails fast in the suite, not first at the driver
    assert(hits.toDouble / nExact >= 0.5,
      s"SemDeDup recall $hits/$nExact fell below the q77 gate floor")
  }

  test("fuzzyContaminatedIds ≡ exact bipartite Jaccard on the corpus") {
    val docs = tables.documents
    val isEval = $"doc_id" % 11 === 0
    val lsh = Decontamination
      .fuzzyContaminatedIds(docs, "doc_id", "text", isEval, 0.7)
      .as[Long].collect().toSet
    // exhaustive cross pairs through the same exact refine: at sf0.001 the
    // train x eval product is tiny, so this is the affordable ground truth
    val sh = Dedup.charShingles(docs, "doc_id", "text", 3)
    val pairs = docs.filter(!isEval).select($"doc_id".as("da"))
      .crossJoin(docs.filter(isEval).select($"doc_id".as("db")))
    val exact = Dedup.jaccardForPairs(sh, pairs, 0.7)
      .select($"da").distinct().as[Long].collect().toSet
    assert(lsh == exact, "LSH path lost a contaminated id vs the exact form")
  }

  test("batchNearDuplicateIds flags the batch side, ≡ exact bipartite Jaccard") {
    val docs = tables.documents
    // synthetic refresh batch: one exact copy, one edit, one novel doc
    val batch = Seq(
      (2000001L, docs.filter($"doc_id" === 1).select("text").head().getString(0)),
      (2000002L, docs.filter($"doc_id" === 2).select("text").head().getString(0) + " edited"),
      (2000003L, "a genuinely novel refresh document about nothing in the corpus"))
      .toDF("doc_id", "text")
    val u = docs.select($"doc_id", $"text").withColumn("is_new", lit(false))
      .unionByName(batch.withColumn("is_new", lit(true)))
    val got = Decontamination
      .batchNearDuplicateIds(u, "doc_id", "text", $"is_new", 0.5)
      .as[Long].collect().toSet
    // ids come from the BATCH side only
    assert(got.forall(_ >= 2000000L))
    // exact bipartite ground truth through the same refine
    val sh = Dedup.charShingles(u, "doc_id", "text", 3)
    val pairs = docs.select($"doc_id".as("da"))
      .crossJoin(batch.select($"doc_id".as("db")))
    val exact = Dedup.jaccardForPairs(sh, pairs, 0.5)
      .select($"db").distinct().as[Long].collect().toSet
    assert(got == exact, "LSH batch admission diverged from the exact form")
    assert(got.contains(2000001L) && got.contains(2000002L) && !got.contains(2000003L))
  }
}
