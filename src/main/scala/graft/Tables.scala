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
  /** events.ts has shipped in three parquet spellings across testdata
    * generations — TIMESTAMP(NANOS) (read as BIGINT under the legacy
    * conf), TIMESTAMP_MICROS with isAdjustedToUTC=false (Spark reads
    * TIMESTAMP_NTZ), and UTC-adjusted TIMESTAMP — so the loader adapts to
    * the schema it actually finds instead of assuming one. All downstream
    * code sees a session-TZ TimestampType at microsecond precision; with
    * the session pinned to UTC (Verify/Bench/tests) every spelling lands
    * on the same instants DuckDB's naive read of the same file produces.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df =
      try table("events")
      catch { case e: Throwable
        if e.getMessage != null && e.getMessage.contains("NANOS") =>
          // legacy NANOS tier: only reachable via the conf, and only set
          // when that tier is actually present (not on every call)
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table("events")
      }
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => sys.error(
        s"events.ts: unsupported parquet type $other — expected " +
          "TIMESTAMP(NANOS)-as-LONG, TIMESTAMP_NTZ, or TIMESTAMP (see TESTDATA.md)")
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Required columns and acceptable Catalyst types per table, by
    * `DataType.simpleString`. Alternatives encode the spellings the
    * loaders adapt to (timestamps NTZ/TZ/raw-long; int/bigint keys) —
    * anything outside them is a testdata generation the code has never
    * seen and must fail NAMED, in seconds, not as a mid-round analysis
    * error in whichever query touches the column first (r6: a silent
    * events.ts re-spelling cost 11 queries their correctness entries).
    */
  private val Expected: Seq[(String, Seq[(String, Set[String])])] = {
    val key  = Set("int", "bigint")
    val ts   = Set("timestamp", "timestamp_ntz", "bigint")
    val num  = Set("double", "float", "decimal")
    Seq(
      "region"     -> Seq("r_regionkey" -> key, "r_name" -> Set("string")),
      "nation"     -> Seq("n_nationkey" -> key, "n_name" -> Set("string"), "n_regionkey" -> key),
      "customer"   -> Seq("c_custkey" -> key, "c_name" -> Set("string"),
                          "c_nationkey" -> key, "c_acctbal" -> num, "c_mktsegment" -> Set("string")),
      "supplier"   -> Seq("s_suppkey" -> key, "s_name" -> Set("string"),
                          "s_nationkey" -> key, "s_acctbal" -> num),
      "part"       -> Seq("p_partkey" -> key, "p_name" -> Set("string"), "p_brand" -> Set("string"),
                          "p_type" -> Set("string"), "p_size" -> key, "p_retailprice" -> num),
      "orders"     -> Seq("o_orderkey" -> key, "o_custkey" -> key, "o_orderstatus" -> Set("string"),
                          "o_totalprice" -> num, "o_orderdate" -> ts, "o_orderpriority" -> Set("string")),
      "lineitem"   -> Seq("l_orderkey" -> key, "l_partkey" -> key, "l_suppkey" -> key,
                          "l_linenumber" -> key, "l_quantity" -> num, "l_extendedprice" -> num,
                          "l_discount" -> num, "l_tax" -> num, "l_returnflag" -> Set("string"),
                          "l_linestatus" -> Set("string"), "l_shipdate" -> ts),
      "events"     -> Seq("event_id" -> key, "ts" -> ts, "user_id" -> key,
                          "event_type" -> Set("string"), "value" -> num, "props" -> Set("string")),
      "documents"  -> Seq("doc_id" -> key, "text" -> Set("string"), "lang" -> Set("string"),
                          "source" -> Set("string"), "n_chars" -> key),
      "embeddings" -> Seq("vec_id" -> key, "embedding" -> Set("array<float>", "array<double>"),
                          "label" -> key))
  }

  /** Footer-only schema assertion over every table in `dir`: each problem
    * is reported as table.column (found vs expected), all tables checked
    * before failing so one regeneration surfaces its full blast radius in
    * a single message. Run by Verify and Bench at session startup.
    */
  def smokeCheck(spark: SparkSession, dir: String): Unit = {
    val problems = Expected.flatMap { case (name, cols) =>
      val schemaOrErr =
        try Right(spark.read.parquet(s"$dir/$name.parquet").schema)
        catch {
          // TIMESTAMP(NANOS) without the legacy conf: a known-good events
          // spelling (Tables.events handles it), not a smoke failure
          case e: Throwable if e.getMessage != null && e.getMessage.contains("NANOS") => Left(None)
          case e: Throwable => Left(Some(s"$name: unreadable — ${e.getMessage}"))
        }
      schemaOrErr match {
        case Left(err) => err.toSeq
        case Right(schema) => cols.flatMap { case (col, accepted) =>
          schema.find(_.name == col) match {
            case None => Some(s"$name.$col: MISSING (have: ${schema.fieldNames.mkString(", ")})")
            case Some(f) =>
              val t = f.dataType.simpleString
              if (accepted.exists(a => t == a || t.startsWith(a + "("))) None
              else Some(s"$name.$col: found $t, expected one of ${accepted.mkString("/")}")
          }
        }
      }
    }
    if (problems.nonEmpty) sys.error(
      s"TESTDATA SCHEMA MISMATCH in $dir — the driver likely regenerated " +
        s"/root/testdata with new logical types; adapt the named loaders in " +
        s"Tables.scala:\n  ${problems.mkString("\n  ")}")
  }
}
