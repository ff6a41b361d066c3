package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedTablesSpec extends SparkSpec {

  test("bucketed join == plain join, with NO Exchange on either side") {
    import spark.implicits._
    val o = tables.orders.select($"o_orderkey", $"o_orderstatus")
    val l = tables.lineitem.select($"l_orderkey", $"l_quantity")
    val bo = BucketedTables.writeBucketed(
      o, "graft_spec_bkt_orders", 8, "o_orderkey", Seq("o_orderkey"))
    val bl = BucketedTables.writeBucketed(
      l, "graft_spec_bkt_lineitem", 8, "l_orderkey", Seq("l_orderkey"))

    // hint the fact-fact strategy: at spec scale Catalyst would broadcast
    // (and rightly bypass bucketing); merge is the 100 TB shape on display
    val joined = bo.hint("merge").join(bl, $"o_orderkey" === $"l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("SortMerge"), plan.take(3000))
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(3000)}")
    assert(plan.contains("Bucketed: true"), plan.take(3000))

    val got = joined.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = o.join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("literal key filters prune to a subset of buckets") {
    import spark.implicits._
    val bo = BucketedTables.writeBucketed(
      tables.orders.select($"o_orderkey", $"o_orderstatus"),
      "graft_spec_bkt_prune", 16, "o_orderkey", Seq("o_orderkey"))
    // a bare filter has no exchange to eliminate, so the auto-bucketed
    // scan heuristic would fall back to a splittable plain scan and
    // forfeit pruning; a join keeps it bucketed in real plans (q151) —
    // pin the pruning property directly here
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val plan =
      try bo.filter($"o_orderkey".isin(1L, 7L, 33L))
        .queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    val m = "SelectedBucketsCount: (\\d+) out of 16".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in:\n${plan.take(2000)}")
    assert(m.get.group(1).toInt <= 3, plan.take(2000))
  }

  test("overwrite is idempotent and the catalog read carries bucket metadata") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    BucketedTables.writeBucketed(df, "graft_spec_bkt_small", 4, "k")
    val again = BucketedTables.writeBucketed(df, "graft_spec_bkt_small", 4, "k")
    assert(again.count() == 3)
    val meta = spark.sql("DESCRIBE TABLE EXTENDED graft_spec_bkt_small")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(meta.contains("Num Buckets") && meta.contains("4"), meta)
  }

  test("sweep reclaims a dead-pid dir named via tableName and keeps live-pid dirs") {
    val wh = new org.apache.hadoop.fs.Path(spark.sessionState.conf.warehousePath)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a dead pid: walk down from the pid cap until one isn't running
    val deadPid = Iterator.iterate(4194000L)(_ - 1)
      .find(p => !ProcessHandle.of(p).isPresent).get
    // the REAL naming scheme (underscore-bearing prefix — the r9 sweep
    // regex rejected exactly these and leaked them forever)
    val deadName = BucketedTables.tableName("graft_bkt_orders", "/fake/dir")
      .replace(s"_p${ProcessHandle.current().pid()}_", s"_p${deadPid}_")
    val liveName = BucketedTables.tableName("graft_bkt_orders", "/fake/dir")
    val other = "unrelated_table"
    Seq(deadName, liveName, other).foreach { n =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(wh, n)); ()
    }
    try {
      BucketedTables.sweepNow(spark)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(wh, deadName)),
        s"dead-pid dir $deadName must be swept")
      assert(fs.exists(new org.apache.hadoop.fs.Path(wh, liveName)),
        "live-pid dir must survive the sweep")
      assert(fs.exists(new org.apache.hadoop.fs.Path(wh, other)),
        "non-matching names must never be touched")
    } finally Seq(deadName, liveName, other).foreach { n =>
      fs.delete(new org.apache.hadoop.fs.Path(wh, n), true); ()
    }
  }

  test("tableName is dir-stable and dir-distinct") {
    val a = BucketedTables.tableName("p", "/data/x")
    assert(a == BucketedTables.tableName("p", "/data/x"))
    assert(a != BucketedTables.tableName("p", "/data/y"))
  }
}
