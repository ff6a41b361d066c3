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
  * TPC-H tables and `documents` get `FOR ALL COLUMNS` (ndv/min/max feed
  * the join-reorder cost model — and avgLen feeds CBO's Project SIZE
  * estimate, which matters more than reorder for the text tables: with
  * only table-level stats, CBO sized a narrow (doc_id, ts) projection of
  * `documents` at full-table bytes, un-broadcasting q139's per-candidate
  * timestamp joins into 20M-row sort-merge joins — the r10 ledger's
  * "23x superlinear" row was THIS misplan, not the LSH algorithm).
  * `embeddings` gets column stats for its scalar columns only (column
  * stats are undefined on array columns).
  */
object CatalogStats {

  /** Tables eligible for catalog registration. `events` stays path-based:
    * its TIMESTAMP(NANOS) read needs the legacy-conf + cast wrapper in
    * Tables.events, which a bare catalog scan would bypass.
    */
  val ColumnStatTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "documents")
  /** name -> the scalar columns to ANALYZE (array columns are ineligible). */
  val PartialColumnStatTables = Map("embeddings" -> Seq("vec_id", "label"))

  // (dir, name) registered in this session — Tables consults this so
  // catalog resolution only ever serves the dir the stats were built for
  private val registered = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]

  /** Catalog names carry a dir digest: two dirs analyzed in one session
    * (dev flows, test JVMs) register DISTINCT tables instead of the
    * second DROP+CREATE silently repointing the first dir's resolution.
    * The digest is the first 8 bytes of MD5 — 32-bit String.hashCode
    * collides plausibly across a session's dirs, and a collision would
    * re-create exactly the silent cross-dir serving the digest exists to
    * prevent; 64 collision-resistant bits make it negligible.
    */
  def catalogName(dir: String, name: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(
      dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val digest = md5.take(8).map(b => f"$b%02x").mkString
    s"graft_${digest}_$name"
  }

  /** Register + analyze all eligible tables for `dir`, enable CBO. */
  def analyze(spark: SparkSession, dir: String): Unit = synchronized {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    (ColumnStatTables ++ PartialColumnStatTables.keys).foreach { name =>
      val t = catalogName(dir, name)
      // the memo is JVM-global but catalog tables are per-session: a
      // fresh session after spark.stop() must re-register + re-ANALYZE,
      // not silently no-op into stat-less path reads
      if (!registered.contains((dir, name)) || !spark.catalog.tableExists(t)) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$dir/$name.parquet'")
        PartialColumnStatTables.get(name) match {
          case Some(cols) => spark.sql(
            s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS ${cols.mkString(", ")}")
          case None =>
            spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
        }
        registered.put((dir, name), ())
      }
    }
  }

  /** Drop every table this session registered and forget them — restores
    * path-based resolution (tests that flip CBO state on use this to
    * leave the shared session as they found it).
    */
  def reset(spark: SparkSession): Unit = synchronized {
    registered.keys.foreach { case (dir, name) =>
      spark.sql(s"DROP TABLE IF EXISTS ${catalogName(dir, name)}")
    }
    registered.clear()
  }

  /** The catalog frame for (dir, name) when registered there, else None.
    * `registered` is JVM-global while the catalog is per-SparkSession, so
    * a fresh session after spark.stop() re-checks existence and falls
    * back to the path read instead of throwing TABLE_OR_VIEW_NOT_FOUND.
    */
  def resolve(spark: SparkSession, dir: String, name: String) =
    if (registered.contains((dir, name)) &&
        spark.catalog.tableExists(catalogName(dir, name)))
      Some(spark.table(catalogName(dir, name)))
    else None
}
