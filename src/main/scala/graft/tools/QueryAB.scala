package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B one registry query under harness toggles — currently: with vs
  * without the CatalogStats.analyze CBO stats pass (the one setup step
  * the stage-by-stage profile of q139 didn't replicate when it measured
  * 25 s against the slope harness's 96 s at sf1).
  *
  * Usage: runMain graft.tools.QueryAB <query> <dir> [analyze|noanalyze]
  */
object QueryAB {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val analyze = args.length < 3 || args(2) == "analyze"
    val spark: SparkSession = graft.Bench.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    if (analyze) graft.CatalogStats.analyze(spark, dir)
    val q = graft.SparkEntry.registry.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[ab] $name analyze=$analyze pass$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
