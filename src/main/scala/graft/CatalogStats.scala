package graft

import org.apache.spark.sql.SparkSession

/** CBO wiring (SURVEY §4.2): registers the sf parquet tables as EXTERNAL
  * catalog tables (`graft_<name>`, prefixed so q58/q59-style temp views
  * never shadow them), runs `ANALYZE TABLE` for table + column stats,
  * and enables cost-based join reorder. Once registered for a dir,
  * [[Tables.table]] resolves through the catalog so every registry query
  * plans against real cardinalities — at 100 TB these would be the
  * metastore stats a nightly ANALYZE maintains; the harness computes
  * them once per session (Bench/Verify call [[analyze]] at startup).
  *
  * TPC-H tables get `FOR ALL COLUMNS` (ndv/min/max feed the join-reorder
  * cost model); documents/embeddings get table-level stats only (column
  * stats are undefined on array columns, and no registry query join-
  * reorders on text).
  */
object CatalogStats {

  /** Tables eligible for catalog registration. `events` stays path-based:
    * its TIMESTAMP(NANOS) read needs the legacy-conf + cast wrapper in
    * Tables.events, which a bare catalog scan would bypass.
    */
  val ColumnStatTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val TableStatTables = Seq("documents", "embeddings")

  // (dir, name) registered in this session — Tables consults this so
  // catalog resolution only ever serves the dir the stats were built for
  private val registered = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]

  def catalogName(name: String): String = s"graft_$name"

  /** Register + analyze all eligible tables for `dir`, enable CBO. */
  def analyze(spark: SparkSession, dir: String): Unit = synchronized {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    (ColumnStatTables ++ TableStatTables).foreach { name =>
      if (!registered.contains((dir, name))) {
        val t = catalogName(name)
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$dir/$name.parquet'")
        if (ColumnStatTables.contains(name))
          spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
        else
          spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
        registered.put((dir, name), ())
      }
    }
  }

  /** The catalog frame for (dir, name) when registered there, else None. */
  def resolve(spark: SparkSession, dir: String, name: String) =
    if (registered.contains((dir, name))) Some(spark.table(catalogName(name)))
    else None
}
