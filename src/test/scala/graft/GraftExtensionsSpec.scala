package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DotProduct, DotProductSafe}

/** The SQL integration surface: registered functions must agree with
  * their Column-API originals, and the optimizer rule must rewrite the
  * higher-order dot-product spelling into the codegen'd expression
  * without changing results.
  */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val session = { GraftExtensions.install(spark); spark }

  test("registered SQL functions match the Column API battery") {
    val s = session
    s.range(1).createOrReplaceTempView("one")
    val row = s.sql(
      """SELECT format_diagnosis_code('25000') AS dx,
        |       format_postal_code('941031234') AS zip,
        |       get_name('1', 'DOE', 'JANE', 'Q') AS nm,
        |       x12_date('20260115') AS d,
        |       token_count('a quick brown fox') AS tc,
        |       bpe_token_count('Hello, world! don''t') AS bpe,
        |       language_id('the cat and the dog went to the market and that') AS lang,
        |       doc_fingerprint('abcdefghij') AS fp
        |FROM one""".stripMargin).collect().head
    assert(row.getAs[String]("dx") == "250.00")
    assert(row.getAs[String]("zip") == "94103-1234")
    assert(row.getAs[String]("nm") == "DOE, JANE, Q")
    assert(row.getAs[java.sql.Date]("d") == java.sql.Date.valueOf("2026-01-15"))
    assert(row.getAs[Int]("tc") == 4)
    // "Hello" "," " world" "!" " don" "'t" -> 6 pre-merge tokens
    assert(row.getAs[Int]("bpe") == 6)
    assert(row.getAs[String]("lang") == "en")
    // fingerprint: same value as the Column API on the same input
    import s.implicits._
    val viaColumn = Seq("abcdefghij").toDF("t")
      .select(graft.functions.TextFunctions.fingerprint($"t")).collect().head.getLong(0)
    assert(row.getAs[Long]("fp") == viaColumn)
  }

  test("graft_dot in SQL equals the codegen'd Column expression") {
    val s = session
    import s.implicits._
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(s.sql("SELECT graft_dot(a, b) AS d FROM vecs").collect().head.getDouble(0) == 32.0)
  }

  test("optimizer rewrites aggregate(zip_with(*)) to the codegen'd dot product") {
    val s = session
    import s.implicits._
    // parquet roundtrip: a real scan (a LocalRelation would be constant-
    // folded away before the rule could matter). Spark's parquet reader
    // reports containsNull=true, so the null-faithful variant is expected.
    val dir = java.nio.file.Files.createTempDirectory("graft_vec").toString
    Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, 0.0, 0.0), Array(2.0, 9.0, 1.0))).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val df = s.read.parquet(dir)
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0d), (acc, x) => acc + x).as("d"))
    val optimized = hof.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[DotProductSafe])),
      s"expected DotProductSafe in:\n$optimized")
    assert(hof.as[Double].collect().toSet == Set(32.0, 1.0))
    // non-null element metadata does NOT imply equal lengths, so even the
    // typed in-memory branch must get the length-checked variant — the
    // unchecked DotProduct would turn the HOF form's NULL on a length
    // mismatch into a partial min-length sum
    val typed = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0d), (acc, x) => acc + x))
    val analyzed = typed.queryExecution.analyzed
    assert(org.apache.spark.sql.graft.RewriteHofDotProduct(analyzed)
      .expressions.exists(_.exists(_.isInstanceOf[DotProductSafe])))
  }

  test("length mismatch stays NULL even when elements are provably non-null") {
    val s = session
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_len").toString
    Seq((1, 1.0), (1, 2.0), (2, 3.0)).toDF("g", "x").write.mode("overwrite").parquet(dir)
    // collect_list of a non-nullable expression yields containsNull=false
    // arrays of varying per-group length — the branch that formerly got
    // the unchecked DotProduct and silently summed over min(len)
    val arrs = s.read.parquet(dir)
      .groupBy($"g").agg(collect_list(coalesce($"x", lit(0.0))).as("v"))
    assert(!arrs.schema("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val a = arrs.select($"g".as("ga"), $"v".as("va"))
    val b = arrs.select($"g".as("gb"), $"v".as("vb"))
    val hof = a.join(b, $"ga" < $"gb").select(
      aggregate(zip_with($"va", $"vb", (x, y) => x * y), lit(0.0d), (acc, x) => acc + x).as("d"))
    assert(hof.queryExecution.optimizedPlan
      .expressions.exists(_.exists(_.isInstanceOf[DotProductSafe])))
    val rows = hof.collect()
    assert(rows.length == 1 && rows.head.isNullAt(0),
      s"2-vs-1 length mismatch must be NULL, got ${rows.mkString(",")}")
  }

  test("rewritten dot product preserves the HOF null and length semantics") {
    val s = session
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_null").toString
    Seq(
      (1L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0, 3.0)),
      (2L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](2.0)),
      (3L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)))
      .toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    def run(rewrite: Boolean): Map[Long, Option[Double]] = {
      val df = s.read.parquet(dir)
      val hof = df.select($"id",
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0d), (acc, x) => acc + x).as("d"))
      if (rewrite)
        assert(hof.queryExecution.optimizedPlan
          .expressions.exists(_.exists(_.isInstanceOf[DotProductSafe])))
      hof.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    }
    val expected = Map(1L -> None, 2L -> None, 3L -> Some(11.0))
    assert(run(rewrite = true) == expected) // null element / unequal length -> null
  }

  test("spark.sql.extensions config path registers the same surface") {
    // a separately-built session picks the extensions up from config; use
    // newSession isolation on a dedicated builder-applied context is not
    // possible in one JVM, so drive the injection object directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // injection is validated end-to-end by the install() tests above; here
    // assert the hook itself registers without error and is idempotent
    new GraftExtensions().apply(ext)
  }

  test("round-4 SQL additions: scripts, classifier weight, intra-doc line dedup") {
    val s = session
    s.range(1).createOrReplaceTempView("one")
    val row = s.sql(
      """SELECT dominant_script('\u043f\u0440\u0438\u0432\u0435\u0442') AS scr,
        |       script_counts('ab\u4f60\u597d').han AS han,
        |       classifier_weight('fox') AS w,
        |       dedup_lines('a\nb\na').n_removed AS removed,
        |       dedup_lines('a\nb\na').clean_text AS clean
        |FROM one""".stripMargin).collect().head
    assert(row.getAs[String]("scr") == "cyrillic")
    assert(row.getAs[Int]("han") == 2)
    // same value as the Column API
    import s.implicits._
    val viaColumn = Seq("fox").toDF("t")
      .select(graft.operators.QualityClassifier.tokenWeight($"t")).collect().head.getLong(0)
    assert(row.getAs[Long]("w") == viaColumn)
    assert(row.getAs[Long]("removed") == 1L)
    assert(row.getAs[String]("clean") == "a\nb")
  }

  test("round-7 SQL additions: char entropy, URL canonicalization") {
    val s = session
    s.range(1).createOrReplaceTempView("one")
    val row = s.sql(
      """SELECT char_entropy_stats('abcd').entropy AS h,
        |       char_entropy_stats('zzzz').n_distinct AS nd,
        |       canonicalize_url('HTTPS://WWW.Example.COM:443/a/?utm_source=x&id=1#frag') AS cu,
        |       canonical_host(canonicalize_url('https://www.example.com/p')) AS ch
        |FROM one""".stripMargin).collect().head
    assert(math.abs(row.getAs[Double]("h") - 2.0) < 1e-9)
    assert(row.getAs[Long]("nd") == 1L)
    assert(row.getAs[String]("cu") == "https://example.com/a?id=1")
    assert(row.getAs[String]("ch") == "example.com")
  }
}
