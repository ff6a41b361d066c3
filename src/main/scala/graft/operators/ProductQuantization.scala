package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: product-quantization residual compression over an
  * [[IvfIndex]] (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — the standard second stage of
  * the billion-scale ANN stack; same layout as faiss `IVFx,PQm`).
  *
  * Why it exists at 100 TB: the plain IVF index stores the raw float
  * vectors per cell — at 10⁹ × 1024-dim float32 that is ~4 TB of index
  * before replication. PQ stores each vector as `m` sub-codeword ids
  * (one byte each at ks ≤ 256) against `m` tiny per-subspace codebooks
  * trained on the coarse RESIDUAL (v − centroid(cell)): m = 8 turns a
  * 256-byte vector into 8 bytes — the codes for the same corpus fit in
  * executor memory, and the ADC scoring pass reads 32× fewer bytes per
  * probed cell.
  *
  * Spark shape:
  *   - train: one narrow residual pass, then `m` seeded k-means fits
  *     over the dsub-dim sub-slices (metadata-scale models: m·ks·dsub
  *     doubles — ~8 KB at m=8, ks=16, d=64). At 100 TB training runs on
  *     a bounded deterministic sample (`trainCap`) — codebooks are a
  *     statistics artifact, not a per-row one.
  *   - encode: ROW-LOCAL argmin over the broadcast codebook literal —
  *     builtins only (transform/zip_with/aggregate/array_position), no
  *     UDF, fully codegen'd; the only job is the write.
  *   - query (ADC, spelled decode-then-score): probes pick nProbe cells
  *     against the centroid table exactly like [[IvfIndex.topK]]; inside
  *     probed cells the candidate's vector is RECONSTRUCTED from its
  *     codes (centroid + per-subspace codeword — a row-local flatten/
  *     element_at over the codebook literal) and cosine-scored. Cost per
  *     probe is nProbe/nLists of the corpus in CODE bytes, not vector
  *     bytes.
  *
  * Determinism contract (what the q156 checksum differential gates):
  * given frozen codebooks + centroids, encode is a pure function of the
  * vector — argmin ties break to the LOWEST code id (array_position
  * returns the first minimum). So persisted codes ≡ any later re-encode,
  * bit for bit, under any partitioning.
  */
object ProductQuantization {

  /** m × ks × dsub codebooks; books(mi)(k) is codeword k of subspace mi. */
  final case class Codebooks(m: Int, ks: Int, dsub: Int,
      books: Array[Array[Array[Double]]])

  /** Deterministic cap on rows fed to codebook training (id-ordered
    * head via modulo would bias; a hash-free `id % step == 0` stride is
    * unbiased for synthetic ids and cheap — the standard "train on a
    * sample" PQ discipline; faiss defaults to ~256·ks points/subspace).
    */
  val DefaultTrainCap = 262144L

  private def residualCol(vCol: Column, cvCol: Column): Column =
    zip_with(vCol, cvCol, (a, b) => a - b)

  /** Train per-subspace codebooks on coarse residuals of `assignments`
    * (id, v, cell) against `centroids`. d must equal m·dsub.
    */
  def train(assignments: DataFrame, centroids: Array[(Int, Array[Double])],
      m: Int, ks: Int, seed: Long = 42L,
      trainCap: Long = DefaultTrainCap): Codebooks = {
    val spark = assignments.sparkSession
    import spark.implicits._
    val d = centroids.head._2.length
    require(d % m == 0, s"d=$d not divisible by m=$m subspaces")
    val dsub = d / m
    val cents = broadcast(centroids.toSeq.toDF("cell", "cv"))
    val n = assignments.count()
    val step = math.max(1L, n / trainCap)
    val res = assignments.join(cents, Seq("cell"))
      .filter(pmod(col("id"), lit(step)) === 0)
      .select(residualCol(col("v"), col("cv")).as("r"))
      .cache()
    try {
      // the m per-subspace fits are independent — submit them from
      // concurrent threads so their (driver-dominated: job planning,
      // small-data Lloyd's rounds) wall times overlap instead of
      // stacking. Results are bit-identical to the sequential spelling:
      // each fit sees the same cached residual frame and its own fixed
      // seed, and Spark schedules jobs from multiple threads fairly.
      // On a real cluster this is also the right shape — the fits are
      // data-parallel within AND job-parallel across subspaces (the
      // bench's index_build_ms.ivf_pq line tracks the measured win).
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(m, 8))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      val books =
        try Await.result(Future.sequence((0 until m).toList.map { mi =>
          Future {
            val feat = res.select(slice(col("r"), mi * dsub + 1, dsub).as("sub"))
              .withColumn("features", array_to_vector(col("sub")))
            val model = new KMeans().setK(ks).setSeed(seed + mi).setMaxIter(10).fit(feat)
            model.clusterCenters.map(_.toArray)
          }
        }), Duration.Inf).toArray
        catch { case t: Throwable =>
          // a failed fit rethrows through Await while up to m-1 sibling
          // fits are still in flight; graceful shutdown() would let them
          // run to completion with discarded results — interrupt them so
          // a failed training round releases driver/cluster resources
          pool.shutdownNow(); throw t
        }
        finally pool.shutdown()
      Codebooks(m, ks, dsub, books)
    } finally { res.unpersist(); () }
  }

  /** The row-local code array for residual column `rCol`: per subspace,
    * argmin-d² codeword id (ties to the lowest id — array_position finds
    * the FIRST minimum). Builtins only; codebooks ride as a literal.
    */
  def codesCol(rCol: Column, cb: Codebooks): Column = {
    val perSub = (0 until cb.m).map { mi =>
      val sub = slice(rCol, mi * cb.dsub + 1, cb.dsub)
      val cbm = typedLit(cb.books(mi).map(_.toSeq).toSeq)
      val d2s = transform(cbm, cw =>
        aggregate(zip_with(sub, cw, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      (array_position(d2s, array_min(d2s)) - 1).cast("int")
    }
    array(perSub: _*)
  }

  /** Encode every row of `assignments` (id, v, cell): (id, cell, codes). */
  def encode(assignments: DataFrame,
      centroids: Array[(Int, Array[Double])], cb: Codebooks): DataFrame = {
    val spark = assignments.sparkSession
    import spark.implicits._
    val cents = broadcast(centroids.toSeq.toDF("cell", "cv"))
    assignments.join(cents, Seq("cell"))
      .select(col("id"), col("cell"),
        codesCol(residualCol(col("v"), col("cv")), cb).as("codes"))
  }

  /** Reconstruction of the full vector from (cell centroid, codes) —
    * centroid + concatenated codewords; row-local over the codebook
    * literal.
    */
  def reconstructCol(cvCol: Column, codesCol: Column, cb: Codebooks): Column = {
    val booksLit = typedLit(cb.books.map(_.map(_.toSeq).toSeq).toSeq)
    val residual = flatten(zip_with(
      codesCol, sequence(lit(0), lit(cb.m - 1)),
      (c, mi) => element_at(element_at(booksLit, mi + 1), c + 1)))
    zip_with(cvCol, residual, (a, b) => a + b)
  }

  /** Persist codes (cell-partitioned, like the IVF assignments — probed
    * cells prune the code scan) + the codebook side table.
    */
  def persist(codes: DataFrame, cb: Codebooks, dir: String): Unit = {
    codes.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    val spark = codes.sparkSession
    import spark.implicits._
    val rows = for {
      mi <- 0 until cb.m; k <- 0 until cb.ks
    } yield (mi, k, cb.books(mi)(k).toSeq)
    rows.toDF("mi", "k", "cw")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  def loadCodebooks(spark: SparkSession, dir: String): Codebooks = {
    val rows = spark.read.parquet(s"$dir/codebooks")
      .select(col("mi"), col("k"), col("cw")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val ks = rows.map(_._2).max + 1
    val books = Array.ofDim[Array[Double]](m, ks)
    rows.foreach { case (mi, k, cw) => books(mi)(k) = cw }
    Codebooks(m, ks, books(0)(0).length, books)
  }

  def loadCodes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/codes")
      .select(col("id"), col("cell").cast("int").as("cell"), col("codes"))

  /** ADC cosine top-k: probes (from the IVF assignments) score ONLY the
    * codes of their nProbe nearest cells, against the RECONSTRUCTED
    * vectors — the original vector column is never read on the
    * candidate side. Same plan skeleton as [[IvfIndex.topK]].
    *
    * `rerank > 0` adds the standard refine stage (faiss
    * `IndexRefineFlat`): the ADC pass keeps its top-`rerank` per probe,
    * and ONLY those candidates' original vectors are re-read and
    * exact-cosine-ranked for the final k. At 100 TB that is k·rerank
    * full vectors per probe — metadata-scale reads on top of the
    * code-only scan; recall becomes "true neighbor within the ADC
    * top-rerank" instead of "ADC ranks it top-k", which survives the
    * per-code quantization noise.
    */
  def adcTopK(spark: SparkSession, ivf: IvfIndex.Model, cb: Codebooks,
      codes: DataFrame, probeIds: Seq[Long], k: Int, nProbe: Int = 4,
      rerank: Int = 0): DataFrame = {
    import spark.implicits._
    val probes = ivf.assignments.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    val cents = ivf.centroids.toSeq.toDF("cell", "cv")
    val wCells = Window.partitionBy(col("qid")).orderBy(col("dist"))
    val probeCells = probes.crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("cell"), col("cv"),
        (dot(col("qv"), col("qv")) - lit(2) * dot(col("qv"), col("cv"))
          + dot(col("cv"), col("cv"))).as("dist"))
      .withColumn("rn", row_number().over(wCells))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cell"), col("cv"))
    val cand = codes.select(col("id").as("cid"), col("cell"), col("codes"))
    val scored = broadcast(probeCells).join(cand, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("rec", reconstructCol(col("cv"), col("codes"), cb))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("rec")) / (norm(col("qv")) * norm(col("rec"))))
          .as("cos"))
      .groupBy(col("qid"), col("cid")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val adc = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= math.max(k, rerank))
      .select(col("qid"), col("rn"), col("cid"), col("cos"))
    if (rerank <= 0) adc.filter(col("rn") <= k)
    else {
      // refine: exact cosine over ONLY the shortlisted candidates'
      // original vectors (a hits-scale semi-join back to the corpus)
      val shortlist = adc.select(col("qid"), col("cid"))
      val qv = probes // (qid, qv) — broadcast-sized: |probeIds| rows
      val cv2 = ivf.assignments.select(col("id").as("cid"), col("v").as("cv2"))
      val exact = shortlist
        .join(cv2, Seq("cid"))
        .join(broadcast(qv), Seq("qid"))
        .select(col("qid"), col("cid"),
          (dot(col("qv"), col("cv2")) / (norm(col("qv")) * norm(col("cv2"))))
            .as("cos"))
      exact.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("qid"), col("rn"), col("cid"), col("cos"))
    }
  }

  /** Exact-integer code checksum (order-free, float64-safe): per row
    * (id % 9973 + 1) · Σ_mi (mi+1)·(code_mi+1), summed. Any code flip,
    * swap between subspaces, or row loss moves it.
    */
  def codeChecksum(codes: DataFrame): Long = {
    val spark = codes.sparkSession
    import spark.implicits._
    val perRow = aggregate(
      zip_with(col("codes"), sequence(lit(1), size(col("codes"))),
        (c, i) => (c + 1) * i),
      lit(0), (acc, x) => acc + x).cast("long") * (pmod(col("id"), lit(9973)) + 1)
    codes.select(coalesce(sum(perRow), lit(0L)).as("s")).as[Long].head()
  }
}
