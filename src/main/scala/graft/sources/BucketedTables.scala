package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed managed tables: the co-located-join storage layout
  * (SURVEY.md §2.4 J-family scale note; Spark's hive-style bucketing).
  *
  * Bucketing trades ONE write-time shuffle for ZERO shuffles on every
  * subsequent equi-join or aggregation on the bucket key: both sides
  * of fact⋈fact land pre-partitioned on disk (`Bucketed: true` scans,
  * `SelectedBucketsCount` pruning for point predicates), so the join
  * plan is scan → sort-merge with NO Exchange on either side — at
  * 100 TB that is the difference between re-shuffling the fact table
  * per query and never shuffling it again. `sortBy` additionally
  * persists bucket-local order, which drops the SMJ's sort to a cheap
  * verification pass.
  *
  * Bucket count guidance at scale: target file sizes of 128 MB–1 GB
  * per bucket per partition; too few buckets recreates the hot-task
  * problem, too many makes small files. The tests pin the no-Exchange
  * property rather than a count.
  */
object BucketedTables {

  /** Writes `df` as a bucketed+sorted managed parquet table (overwrite
    * — idempotent per table name) and returns the table re-read through
    * the catalog, which is what carries the bucketing metadata into
    * downstream plans (a plain path read would discard it).
    */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, key: String,
      sortCols: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, s"buckets=$buckets")
    val spark = df.sparkSession
    // A managed-table location can survive a previous JVM whose
    // in-memory catalog died with it; saveAsTable then refuses to
    // create over the orphaned directory (LOCATION_ALREADY_EXISTS).
    // If the catalog does not know the table, its leftover location is
    // provably orphaned — remove it so overwrite stays idempotent
    // across JVMs, not just within one.
    if (!spark.catalog.tableExists(table)) {
      val p = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, table.toLowerCase)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    val sorted = sortCols match {
      case Nil => w
      case h :: t => w.sortBy(h, t: _*)
    }
    sorted.saveAsTable(table)
    df.sparkSession.table(table)
  }

  /** A stable per-input-dir table name so repeated runs overwrite their
    * own tables instead of accumulating, while concurrent runs against
    * DIFFERENT data dirs never collide.
    */
  def tableName(prefix: String, dir: String): String =
    s"${prefix}_${java.lang.Integer.toHexString(dir.hashCode)}"
}
