package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ quality-at-scale flag (r11 verdict item 6): measures IVF-PQ ADC
  * recall@k and a rank-agreement statistic against the exact cosine
  * top-k, over a configurable query set, and prints ONE JSON line for
  * the slope-ledger artifacts. q156's driver gate pins recall >= 0.6 at
  * the gate tier over 10 queries; this tool is the same measurement run
  * where it matters — sf1, more queries — so the compression claim
  * ("8 B codes replace 256 B floats") carries a measured quality bound
  * at the tier the 100 TB argument extrapolates from.
  *
  * Rank agreement = mean Spearman rho between the exact top-k ranking
  * and the ADC ranking restricted to the common hits (rho over < 2
  * common items is undefined and skipped) — recall says the right
  * neighbors surface; rho says they surface in the right order.
  *
  * Usage: runMain graft.tools.PqRecall <sfDir> [nQueries] [k] [nProbe] [rerank]
  */
object PqRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nQ = if (args.length > 1) args(1).toInt else 50
    val k = if (args.length > 2) args(2).toInt else 5
    val nProbe = if (args.length > 3) args(3).toInt else 4
    val rerank = if (args.length > 4) args(4).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-pq-recall").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      val t0 = System.nanoTime()
      val ivf = graft.operators.IvfIndex.load(
        spark, graft.queries.TextQueries.ivfIndexDir(spark, dir))
      val pqDir = graft.queries.TextQueries.pqIndexDir(spark, dir)
      val cb = graft.operators.ProductQuantization.loadCodebooks(spark, pqDir)
      val codes = graft.operators.ProductQuantization.loadCodes(spark, pqDir)
      val buildSec = (System.nanoTime() - t0) / 1e9
      val e = graft.Tables(spark, dir).embeddings
      val qids = (0L until nQ.toLong).toSeq
      val exact = graft.operators.SimilaritySearch
        .topK(e.filter($"vec_id" < nQ), e, "vec_id", "embedding", k)
        .select($"qid", $"cid", $"rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val adc = graft.operators.ProductQuantization
        .adcTopK(spark, ivf, cb, codes, qids, k = k, nProbe = nProbe, rerank = rerank)
        .select($"qid", $"cid", $"rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val exByQ = exact.groupBy(_._1)
      val adcByQ = adc.groupBy(_._1)
      val perQ = qids.map { q =>
        val ex = exByQ.getOrElse(q, Array.empty).map(t => t._2 -> t._3).toMap
        val ad = adcByQ.getOrElse(q, Array.empty).map(t => t._2 -> t._3).toMap
        val common = ex.keySet & ad.keySet
        val recall = if (ex.isEmpty) 1.0 else common.size.toDouble / ex.size
        // Spearman over the common hits' (exact rank, adc rank) pairs
        val rho = if (common.size < 2) None else {
          val n = common.size
          def ranks(m: Map[Long, Int]): Map[Long, Double] =
            common.toSeq.sortBy(m).zipWithIndex
              .map { case (id, i) => id -> (i + 1).toDouble }.toMap
          val ra = ranks(ex); val rb = ranks(ad)
          val d2 = common.iterator.map { id =>
            val d = ra(id) - rb(id); d * d
          }.sum
          Some(1.0 - 6.0 * d2 / (n * (n.toDouble * n - 1)))
        }
        (recall, rho)
      }
      val meanRecall = perQ.map(_._1).sum / perQ.size
      val rhos = perQ.flatMap(_._2)
      val meanRho = if (rhos.isEmpty) 0.0 else rhos.sum / rhos.size
      val j = String.format(java.util.Locale.ROOT,
        """{"metric":"pq_recall","sf_dir":"%s","n_queries":%d,"k":%d,"n_probe":%d,"rerank":%d,""" +
          """"recall_at_k":%.4f,"mean_spearman_rho":%.4f,"n_rho_defined":%d,""" +
          """"flag_recall_ge_060":%b,"index_load_sec":%.1f}""",
        dir, Int.box(nQ), Int.box(k), Int.box(nProbe), Int.box(rerank),
        Double.box(meanRecall), Double.box(meanRho), Int.box(rhos.size),
        Boolean.box(meanRecall >= 0.6), Double.box(buildSec))
      println(j)
    } finally spark.stop()
  }
}
