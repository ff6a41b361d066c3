package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ invariants: code shape/determinism, persist/load round-trip,
  * reconstruction strictly better than centroid-only, ADC recall over
  * the real embeddings fixture, and the exact-integer checksum's
  * sensitivity (the q156 gate's tripwire).
  */
class ProductQuantizationSpec extends SparkSpec {

  import spark.implicits._

  private lazy val ivf: IvfIndex.Model = IvfIndex.build(
    spark, tables.embeddings, "vec_id", "embedding", nLists = 8)

  private lazy val cb: ProductQuantization.Codebooks =
    ProductQuantization.train(ivf.assignments, ivf.centroids, m = 16, ks = 16)

  test("encode: codes are m ids in [0, ks), deterministic across re-encodes and repartitioning") {
    val a = ProductQuantization.encode(ivf.assignments, ivf.centroids, cb)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](2).toSeq)).toMap
    assert(a.nonEmpty)
    assert(a.values.forall(c => c.length == cb.m && c.forall(x => x >= 0 && x < cb.ks)))
    val b = ProductQuantization
      .encode(ivf.assignments.repartition(7), ivf.centroids, cb)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](2).toSeq)).toMap
    assert(a == b, "encode must be a pure row-local function of the vector")
  }

  test("persist/load round-trip: codebooks bit-identical, code table row-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    val codes = ProductQuantization.encode(ivf.assignments, ivf.centroids, cb)
    ProductQuantization.persist(codes, cb, dir)
    val cb2 = ProductQuantization.loadCodebooks(spark, dir)
    assert(cb2.m == cb.m && cb2.ks == cb.ks && cb2.dsub == cb.dsub)
    for (mi <- 0 until cb.m; k <- 0 until cb.ks)
      assert(java.util.Arrays.equals(cb2.books(mi)(k), cb.books(mi)(k)))
    val back = ProductQuantization.loadCodes(spark, dir)
    assert(back.exceptAll(codes).isEmpty && codes.exceptAll(back).isEmpty)
    assert(ProductQuantization.codeChecksum(back) ==
      ProductQuantization.codeChecksum(codes))
  }

  test("reconstruction beats centroid-only: PQ residual codes recover real signal") {
    val cents = broadcast(ivf.centroids.toSeq.toDF("cell", "cv"))
    val codes = ProductQuantization.encode(ivf.assignments, ivf.centroids, cb)
    val joined = ivf.assignments.join(cents, Seq("cell"))
      .join(codes.select($"id", $"codes"), Seq("id"))
      .withColumn("rec", ProductQuantization.reconstructCol($"cv", $"codes", cb))
    def mse(recCol: String) = joined.select(
      (aggregate(zip_with($"v", col(recCol), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x) / size($"v")).as("e"))
      .agg(avg($"e")).as[Double].head()
    val pqMse = mse("rec")
    val coarseMse = mse("cv")
    assert(pqMse < coarseMse * 0.8,
      s"PQ mse $pqMse must be well under centroid-only mse $coarseMse")
  }

  test("ADC top-5 recall@5 >= 0.6 against exact cosine on the embeddings fixture") {
    val codes = ProductQuantization.encode(ivf.assignments, ivf.centroids, cb)
    val e = tables.embeddings
    val exact = SimilaritySearch
      .topK(e.filter($"vec_id" < 10), e, "vec_id", "embedding", 5)
      .select($"qid", $"cid")
    val adc = ProductQuantization
      .adcTopK(spark, ivf, cb, codes, (0L until 10L).toSeq, k = 5, nProbe = 4, rerank = 25)
      .select($"qid", $"cid")
    val nExact = exact.count()
    val hits = exact.join(adc, Seq("qid", "cid")).count()
    assert(nExact == 50)
    assert(hits.toDouble / nExact >= 0.6,
      s"recall@5 = $hits/$nExact below the q156 floor")
  }

  test("code checksum moves on any code flip, subspace swap, or row loss") {
    val codes = ProductQuantization.encode(ivf.assignments, ivf.centroids, cb).cache()
    try {
      val base = ProductQuantization.codeChecksum(codes)
      val flipped = codes.withColumn("codes",
        when($"id" === 0L,
          concat(array(element_at($"codes", 1) + 1), slice($"codes", 2, cb.m - 1)))
          .otherwise($"codes"))
      assert(ProductQuantization.codeChecksum(flipped) != base)
      val swapped = codes.withColumn("codes",
        when($"id" === 1L,
          concat(array(element_at($"codes", 2), element_at($"codes", 1)),
            slice($"codes", 3, cb.m - 2)))
          .otherwise($"codes"))
      // ids 1's first two codes differ on this corpus — swap must move it
      val c12 = codes.filter($"id" === 1L)
        .select(element_at($"codes", 1), element_at($"codes", 2))
        .as[(Int, Int)].head()
      if (c12._1 != c12._2)
        assert(ProductQuantization.codeChecksum(swapped) != base)
      assert(ProductQuantization.codeChecksum(codes.filter($"id" =!= 2L)) != base)
    } finally { codes.unpersist(); () }
  }
}
