package graft.fixtures

import graft.Tables
import graft.operators.SimilaritySearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Committed exact-ANN ground truth for the q50 recall gate (SURVEY.md
  * §2.12 L3): brute-force cosine top-5 for probes vec_id < 10 over the
  * sf0.01 embeddings — the scale the driver's correctness gate runs at.
  *
  * The fixture closes the loop on an approximate operator: IVF results
  * can't be recomputed by the DuckDB oracle, but recall against an
  * exact ground truth can be gated. Spark's live brute force and
  * DuckDB's independent brute force must BOTH reproduce this committed
  * parquet (so the exact side stays differential), and the live IVF
  * result is scored against the live exact top-k for the recall flag.
  * Exact top-k is partitioning-independent (row-local double dot
  * product, cosine rounded to 4dp, ties broken by cid), so the
  * committed file is stable across environments; IVF itself is NOT
  * pinned, because k-means centroid sums depend on partition layout.
  */
object AnnFixtures {

  /** Ground truth is pinned to the correctness-gate scale. */
  val SourceSfDir = "/root/testdata/sf0.01"

  val Path = s"${ClaimFixtures.ExpectedDir}/ann_exact_topk.parquet"

  @volatile private var materialized = false

  /** Write the ground-truth parquet once per JVM if absent (same
    * contract as MappingQueries.ensure: outputs are committed, rebuild
    * only when forced via GRAFT_REGEN_FIXTURES=1).
    */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (!materialized) {
      val force = sys.env.get("GRAFT_REGEN_FIXTURES").contains("1")
      val missing =
        !java.nio.file.Files.exists(java.nio.file.Paths.get(Path, "_SUCCESS"))
      if (force || missing) {
        val e = Tables(spark, SourceSfDir).embeddings
        SimilaritySearch.topK(e.filter(col("vec_id") < 10), e, "vec_id", "embedding", 5)
          .select(col("qid"), col("rn"), col("cid"), col("cos"))
          .coalesce(1).write.mode("overwrite").parquet(Path)
      }
      materialized = true
    }
  }
}
