package graft

import org.apache.spark.sql.SparkSession

/** Dev micro-bench: time named registry queries, N passes each, in one
  * JVM (Bench's noop-sink contract without the full registry sweep).
  *
  * Usage: runMain graft.QBench <sfDir> <passes> <query> [query ...]
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same planning context as Bench/Verify (catalog stats + CBO) — a
    // standalone number must measure the same physical plan the registry
    // sweep measured
    CatalogStats.analyze(spark, sfDir)
    Tables(spark, sfDir).lineitem.limit(1000)
      .write.format("noop").mode("overwrite").save()
    SparkEntry.registry.filter(q => names(q.name)).foreach { q =>
      (1 to passes).foreach { p =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[qbench] ${q.name}%-28s pass $p ${dt}%7.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
