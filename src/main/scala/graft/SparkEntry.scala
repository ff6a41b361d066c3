package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{EventQueries, MappingQueries, RelationalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All declared queries live in graft.queries.*; each pairs a Spark plan
  * with the DuckDB oracle SQL (SURVEY.md §2.14). This object just flattens
  * the registry into the driver's Map shape.
  */
object SparkEntry {

  /** Every declared query, in declaration order. */
  val registry: Seq[QueryDef] =
    RelationalQueries.all ++ EventQueries.all ++ TextQueries.all ++ MappingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
