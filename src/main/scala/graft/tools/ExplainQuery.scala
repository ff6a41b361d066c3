package graft.tools

/** Print a registry query's physical plan under harness toggles.
  * Usage: runMain graft.tools.ExplainQuery <query> <dir> [analyze|noanalyze]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val analyze = args.length < 3 || args(2) == "analyze"
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    if (analyze) graft.CatalogStats.analyze(spark, dir)
    val q = graft.SparkEntry.registry.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    println(s"==== $name analyze=$analyze ====")
    q.run(spark, dir).explain("formatted")
    spark.stop()
  }
}
