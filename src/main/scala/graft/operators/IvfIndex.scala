package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor index (SURVEY.md §2.12
  * L3 scale path, alternative to the hyperplane-LSH variant).
  *
  * Build: k-means coarse quantizer over the embedding column (Spark ML,
  * seeded) assigns every vector to one of `nLists` cells — one narrow
  * model.transform, then the assignment column rides with the data
  * (repartition/bucket by cell at 100 TB so a cell is co-located).
  *
  * Query: each probe scores the `nProbe` nearest centroids (driver-side
  * math on nLists small vectors — metadata scale), then exact cosine runs
  * only inside those cells via a broadcast (probe, cell) join: cost is
  * nProbe/nLists of the corpus per probe instead of all-pairs. Recall
  * depends on how well cells capture the neighborhood — measured against
  * exact topK in OperatorsSpec.
  */
object IvfIndex {

  final case class Model(assignments: DataFrame, centroids: Array[(Int, Array[Double])])

  /** Assign every row of (idCol, vecCol) to a k-means cell. */
  def build(spark: SparkSession, df: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16): Model = {
    val feat = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    // a coarse quantizer needs rough cells, not convergence — 10 iterations
    // is plenty (recall floor is asserted in OperatorsSpec)
    val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(10).fit(feat)
    val assigned = model.transform(feat)
      .select(col("id"), col("v"), col("prediction").as("cell"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c: MlVector, i) => (i, c.toArray) }
    Model(assigned, centroids)
  }

  /** Persist a built index: assignments as a cell-partitioned parquet
    * table (the probe's broadcast (probe, cell) join then prunes to the
    * probed cells — dynamic partition pruning makes the read an INDEX
    * SCAN of nProbe/nLists of the corpus, and at 100 TB the cell dirs
    * are the co-location unit), centroids as a metadata-scale side
    * table. Training happens once at build; every subsequent session
    * [[load]]s and probes.
    */
  def persist(m: Model, dir: String): Unit = {
    m.assignments.write.mode("overwrite")
      .partitionBy("cell").parquet(s"$dir/assignments")
    val spark = m.assignments.sparkSession
    import spark.implicits._
    m.centroids.toSeq.toDF("cell", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Assign a batch to the EXISTING coarse quantizer — the incremental
    * maintenance step: new vectors take the argmin-distance cell (ties by
    * cell id) against the frozen centroid table, no retrain. The centroid
    * frame is metadata-scale (nLists rows, broadcast literal), so the
    * assignment is one embarrassingly-parallel pass over the batch; the
    * per-row window only ever sees nLists rows. Output: (id, v, cell, d2).
    */
  def assign(batch: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Double])]): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cents = centroids.toSeq.toDF("cell", "cv")
    val w = Window.partitionBy(col("id")).orderBy(col("d2"), col("cell"))
    batch.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("v"), col("cell"),
        (dot(col("v"), col("v")) - lit(2) * dot(col("v"), col("cv"))
          + dot(col("cv"), col("cv"))).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("v"), col("cell"), col("d2"))
  }

  /** Append a batch to a persisted index as an `appends/batch=<id>`
    * component (cell-partitioned like the main table): O(batch) work —
    * the existing assignments are never read or rewritten, mirroring
    * SignatureIndex.append's refresh contract. A caller-named batchId
    * makes replay overwrite itself (idempotent warm re-runs).
    */
  def append(batch: DataFrame, idCol: String, vecCol: String,
      dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val m = load(spark, dir)
    assign(batch, idCol, vecCol, m.centroids)
      .select(col("id"), col("v"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/appends/batch=$batchId")
  }

  /** Load a persisted index. The centroid table is nLists rows —
    * collected once; assignments stay a lazy partitioned scan (the
    * epoch table plus any appended batch components).
    */
  def load(spark: SparkSession, dir: String): Model = {
    val epoch = spark.read.parquet(s"$dir/assignments")
      .select(col("id"), col("v"), col("cell").cast("int").as("cell"))
    // Hadoop FileSystem, not java.nio: nio always reports false for
    // hdfs:///s3a:// paths, which would silently drop appended batches
    // from probe results off-local (the SignatureIndex.listTable trap).
    val appendRoot = new org.apache.hadoop.fs.Path(dir, "appends")
    val appendFs = appendRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val assigned =
      if (appendFs.exists(appendRoot) &&
          appendFs.getFileStatus(appendRoot).isDirectory) {
        val appended = spark.read.parquet(appendRoot.toString)
          .select(col("id"), col("v"), col("cell").cast("int").as("cell"))
        epoch.unionByName(appended)
      } else epoch
    val centroids = spark.read.parquet(s"$dir/centroids")
      .select(col("cell"), col("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    Model(assigned, centroids)
  }

  /** Cosine top-k restricted to each probe's nProbe nearest cells. */
  def topK(spark: SparkSession, m: Model, probeIds: Seq[Long], k: Int,
      nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val probes = m.assignments.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("qid"), col("v").as("qv"))
    // probe -> candidate cells: computed against the centroid table, which
    // is metadata-scale (nLists rows) and broadcast as a literal frame
    val cents = m.centroids.toSeq.toDF("cell", "cv")
    val wCells = Window.partitionBy(col("qid")).orderBy(col("dist"))
    val probeCells = probes.crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("cell"),
        (dot(col("qv"), col("qv")) - lit(2) * dot(col("qv"), col("cv"))
          + dot(col("cv"), col("cv"))).as("dist"))
      .withColumn("rn", row_number().over(wCells))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cell"))
    val probeNorm = probeCells.withColumn("qn", norm(col("qv")))
    val cand = m.assignments
      .select(col("id").as("cid"), col("v").as("cv2"), col("cell"))
      .withColumn("cn", norm(col("cv2")))
    val scored = broadcast(probeNorm).join(cand, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosinePrenormed(dot(col("qv"), col("cv2")), col("qn"), col("cn")), 4).as("cos"))
      .distinct() // a pair can appear via several probed cells
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("cid"), col("cos"))
  }
}
