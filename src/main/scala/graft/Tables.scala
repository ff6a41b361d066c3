package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided analytics tables (TESTDATA.md).
  *
  * All tables are parquet; schemas are fixed (FIXTURES.md §1) and never
  * inferred. Every reader goes through `table()` so scan options (pushdown,
  * pruning) are uniform. At 100 TB these would be partitioned/bucketed
  * catalog tables; the access pattern (named handles, no path literals in
  * query code) is the same.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  /** Catalog-resolved when CatalogStats.analyze registered this dir (the
    * plan then carries ANALYZE stats for CBO), plain path scan otherwise.
    */
  def table(name: String): DataFrame =
    CatalogStats.resolve(spark, dir, name)
      .getOrElse(spark.read.parquet(s"$dir/$name.parquet"))

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for: read the raw nanos as BIGINT and truncate to a micros timestamp —
    * exactly what DuckDB's epoch_us does on its TIMESTAMP_NS read, so both
    * engines agree at microsecond precision.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
