package graft

import graft.operators.{Dedup, MinHashLSH}
import org.apache.spark.sql.SparkSession

/** Dev profiler for the near-dup pipeline stages (the bench's dominant
  * queries): prints per-stage wall time at the given SF dir.
  *
  * Usage: runMain graft.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime
      val n = f
      println(f"[prof] $name%-22s ${(System.nanoTime - t0) / 1e9}%7.2f s  rows=$n")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = Dedup.charShingles(docs, "doc_id", "text").cache()
    t("shingles+cache")(sh.count())
    val sig = MinHashLSH.signatures(sh, 128)
    t("signatures")(sig.count())
    val sigC = sig.cache(); sigC.count()
    val cand = MinHashLSH.candidatePairs(sigC, 32, 4)
    t("candidatePairs")(cand.count())
    val candC = cand.cache(); candC.count()
    t("refine-bitmap")(Dedup.jaccardForPairs(sh, candC, 0.7).count())
    t("exact-bitmap-all")(Dedup.jaccardPairs(sh, 0.7).count())
    spark.stop()
  }
}
