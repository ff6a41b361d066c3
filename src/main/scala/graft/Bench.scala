package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query against SPARK_GRAFT_SF_DIR and
  * prints one JSON metrics line. Queries execute into the `noop` sink so
  * every output column is actually computed — `count()` would let Catalyst
  * prune the projections being measured.
  *
  * Two passes are timed: a cold pass (first execution, absorbs residual JIT
  * and file-cache warmup) and a warm pass (steady state). The headline
  * `value` is the warm total — the number that reflects what the plans cost,
  * not what one noisy JVM start cost — with the cold totals and any failed
  * query names carried alongside so a degraded or partially failed run is
  * diagnosable from the artifact alone.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen + parquet reader once so the first measured query
    // doesn't absorb JVM/classloading cost
    Tables(spark, sfDir).lineitem.limit(1000)
      .write.format("noop").mode("overwrite").save()

    val failed = collection.mutable.LinkedHashSet[String]()
    def pass(tag: String): Seq[(String, Double)] = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += q.name
        System.err.println(s"[bench:$tag] ${q.name} FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench:$tag] ${q.name}%-28s ${dt}%8.2f s")
      // drop anything a query pinned in the cache manager so storage memory
      // can't accumulate across the registry (r1's back-half degradation)
      spark.catalog.clearCache()
      q.name -> dt
    }

    val cold = pass("cold")
    val warm = pass("warm")
    // Per-query times rounded to ms keep the summary line compact (~2.5 KB
    // for 70 queries): the driver captures only a bounded tail of stdout, so
    // the LAST line must carry the headline numbers and parse on its own.
    // Cold per-query detail goes on its own earlier line — informative when
    // captured, expendable when not.
    def obj(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    def tot(rs: Seq[(String, Double)]) = f"${rs.map(_._2).sum}%.3f"
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"cold_detail","cold_total":${tot(cold)},"unit":"sec","cold_queries":${obj(cold)}}""")
    println(s"""{"metric":"total","value":${tot(warm)},"unit":"sec","queries":${obj(warm)},""" +
      s""""cold_total":${tot(cold)},"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
