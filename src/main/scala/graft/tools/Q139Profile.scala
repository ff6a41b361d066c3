package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, MinHashLSH}

/** Stage-by-stage wall profile of the q139 temporal near-dedup pipeline —
  * names which stage carries a superlinear tier ratio (r10 slope ledger:
  * 23.1x at 10x data, bucket histogram refutes the hot-bucket theory).
  */
object Q139Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-q139-profile")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q139prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ts = docs.select(col("doc_id"), ((col("doc_id") * 37) % 365).as("t"))
    val sh = Dedup.charShingles(docs, "doc_id", "text").cache()
    timed("shingles")(println("  rows " + sh.count()))
    val dictN = timed("dict distinct")(
      sh.select(col("s")).distinct().count())
    println(s"  distinct shingles $dictN (MaxBitmapDict=${Dedup.MaxBitmapDict})")
    val sigs = timed("signatures")(
      { val s = MinHashLSH.signatures(sh, 128).cache(); s.count(); s })
    val tsn = ts.select(col("doc_id"), col("t").cast("long").as("__t"))
    val cell = floor(col("__t").cast("double") / 14.0).cast("long")
    val banded = MinHashLSH.bandKeys(sigs.join(tsn, "doc_id"), 32, 4)
      .withColumn("__cell", explode(array(cell, cell + lit(1L))))
      .select(col("doc_id"), col("band"),
        xxhash64(col("bkey"), col("__cell")).as("bkey"))
    timed("banded rows")(println("  rows " + banded.count()))
    val cand = MinHashLSH.cappedBucketPairs(banded, MinHashLSH.DefaultBucketCap,
      logOverflow = true, dedup = false).cache()
    timed("candidates (multiset)")(println("  rows " + cand.count()))
    val ta = tsn.select(col("doc_id").as("da"), col("__t").as("__ta"))
    val tb = tsn.select(col("doc_id").as("db"), col("__t").as("__tb"))
    val inWindow = cand.join(ta, "da").join(tb, "db")
      .filter(abs(col("__ta") - col("__tb")) <= 14)
      .select(col("da"), col("db")).cache()
    timed("in-window filter")(println("  rows " + inWindow.count()))
    timed("distinct pairs")(println("  rows " + inWindow.distinct().count()))
    val refined = Dedup.jaccardForPairs(sh, inWindow, 0.7, pairsDistinct = false)
    timed("refine")(println("  rows " + refined.count()))
    val full = MinHashLSH.temporalNearDuplicatePairs(sh, ts, 14L, 0.7)
    timed("full operator")(println("  rows " + full.count()))
    spark.stop()
  }
}
