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

  /** Serializes same-JVM writes: two queries sharing a table name (q149
    * and q151 deliberately reuse the same bucketed builds) would race
    * the overwrite if ever run concurrently.
    */
  private val writeLock = new Object

  /** One-time-per-JVM sweep of warehouse leftovers from DEAD pids (the
    * `_p<pid>_` names [[tableName]] mints). Live pids are never
    * touched, which is what makes the delete safe under a shared
    * warehouse path — the previous catalog-absence heuristic could
    * delete a concurrently running JVM's live table out from under it.
    */
  private lazy val sweepDeadPidTables: org.apache.spark.sql.SparkSession => Unit = {
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark => if (done.compareAndSet(false, true)) sweepNow(spark)
  }

  /** The sweep body (once-per-JVM wrapper above; private[sources] so
    * BucketedTablesSpec can exercise it against a fake dead-pid dir
    * without depending on first-call ordering within the JVM).
    */
  private[sources] def sweepNow(spark: org.apache.spark.sql.SparkSession): Unit = {
    val wh = new org.apache.hadoop.fs.Path(spark.sessionState.conf.warehousePath)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) {
      // prefix class must admit '_': tableName mints names like
      // graft_bkt_orders_p<pid>_<hex> — the r9 spelling ([a-z0-9]+)
      // could never match one, making the sweep a silent no-op and
      // leaking every dead pid's table copies in the warehouse
      val pat = "^[a-z0-9_]+_p([0-9]+)_[0-9a-f]+$".r
      fs.listStatus(wh).foreach { st =>
        st.getPath.getName match {
          case pat(pid) =>
            val h = ProcessHandle.of(pid.toLong)
            if (!h.isPresent || !h.get().isAlive) {
              fs.delete(st.getPath, true); ()
            }
          case _ => ()
        }
      }
    }
  }

  /** Writes `df` as a bucketed+sorted managed parquet table (overwrite
    * — idempotent per table name) and returns the table re-read through
    * the catalog, which is what carries the bucketing metadata into
    * downstream plans (a plain path read would discard it).
    */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, key: String,
      sortCols: Seq[String] = Nil): DataFrame = writeLock.synchronized {
    require(buckets > 0, s"buckets=$buckets")
    val spark = df.sparkSession
    sweepDeadPidTables(spark)
    // A managed-table location can survive THIS pid's earlier session
    // whose in-memory catalog died with it (pid reuse aside, pid-scoped
    // names mean the location is provably ours); saveAsTable would then
    // refuse to create over the orphaned directory
    // (LOCATION_ALREADY_EXISTS) — remove it so overwrite stays
    // idempotent. Live tables of OTHER processes have different
    // `_p<pid>_` names and are never candidates.
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

  /** A stable per-(process, input-dir) table name: repeated runs within
    * one JVM overwrite their own tables instead of accumulating, while
    * concurrent JVMs sharing a warehouse path can never collide (the
    * pid infix is also what lets [[sweepDeadPidTables]] reclaim dead
    * processes' leftovers safely).
    */
  def tableName(prefix: String, dir: String): String =
    s"${prefix}_p${ProcessHandle.current().pid()}_" +
      java.lang.Integer.toHexString(dir.hashCode)
}
