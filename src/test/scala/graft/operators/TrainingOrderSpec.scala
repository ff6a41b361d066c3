package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-order assembly + the operators behind q120–q123: keyed
  * distributed prefix sum, TF-IDF keywords, curriculum interleave,
  * length-bucket packing, one-pass character entropy.
  */
class TrainingOrderSpec extends SparkSpec {

  test("keyedPrefixSum equals the per-key global-window formulation") {
    val docs = tables.documents
      .select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("tokens"))
    // force several range partitions so the cross-partition offset path
    // actually runs; sources then span partition boundaries
    val dist = SequencePacking.keyedPrefixSum(
      docs, Seq("source"), Seq(col("doc_id")), col("tokens"), "before", numParts = 7)
      .select(col("doc_id"), col("before"))
    val naive = docs
      .withColumn("before",
        sum(col("tokens")).over(
          Window.partitionBy(col("source")).orderBy(col("doc_id"))) - col("tokens"))
      .select(col("doc_id"), col("before"))
    assert(dist.exceptAll(naive).count() == 0 && naive.exceptAll(dist).count() == 0)
  }

  test("keyedPrefixSum honors multi-column descending order") {
    val docs = tables.documents
      .select(col("doc_id"), col("source"), col("n_chars"))
    val dist = SequencePacking.keyedPrefixSum(
      docs, Seq("source"), Seq(col("n_chars").desc, col("doc_id")), lit(1L), "rk",
      numParts = 5)
    val naive = docs.withColumn("rk",
      row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))).cast("long") - 1L)
    assert(dist.exceptAll(naive).count() == 0 && naive.exceptAll(dist).count() == 0)
  }

  test("TfIdf.topKeywords matches hand-computed scores on a tiny corpus") {
    import spark.implicits._
    // 4 docs; "rare" appears in 1, "pair" in 2, "stop" in all 4
    val docs = Seq(
      (0L, "stop stop rare"),
      (1L, "stop pair"),
      (2L, "stop pair pair"),
      (3L, "stop")).toDF("doc_id", "text")
    val kw = TfIdf.topKeywords(docs, "doc_id", "text", k = 2, nDocs = 4)
      .select($"doc_id", $"term", $"score".cast("double"), $"rnk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    def s(tf: Double, df: Double) =
      BigDecimal(tf * math.log(4.0 / df)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc0: rare (1 * ln 4) beats stop (2 * ln 1 = 0)
    assert(kw.contains((0L, "rare", s(1, 1), 1)))
    assert(kw.contains((0L, "stop", 0.0, 2)))
    // doc2: pair (2 * ln 2) first, stop second
    assert(kw.contains((2L, "pair", s(2, 2), 1)))
    // doc3 has only one term
    assert(kw.count(_._1 == 3L) == 1)
  }

  test("Curriculum.interleave yields a 0..N-1 permutation on equal groups, best-first") {
    import spark.implicits._
    // 3 groups x 4 docs, ids interleaved so group != id order
    val docs = (0 until 12)
      .map(i => (i.toLong, s"g${i % 3}", (i % 3).toLong, 100L - i))
      .toDF("doc_id", "g", "gidx", "len")
    val il = Curriculum.interleave(docs, "g", col("gidx"), col("len"), "doc_id", 3)
    val pos = il.select("position").collect().map(_.getLong(0)).sorted.toSeq
    assert(pos == (0L until 12L))
    // position 0..2 hold each group's longest doc
    val first = il.filter(col("position") < 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first == Set(0L, 1L, 2L)) // len = 100 - id, so the smallest ids are longest
  }

  test("Curriculum.lengthBucketPack: next-pow2 buckets, clamped, batches bounded") {
    import spark.implicits._
    val docs = Seq((0L, 5L), (1L, 16L), (2L, 17L), (3L, 100L), (4L, 4000L))
      .toDF("doc_id", "n_tok")
    val packed = Curriculum.lengthBucketPack(docs, "doc_id", col("n_tok"), docsPerBatch = 2)
    val byId = packed.collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Int]("pad_len"), r.getAs[Long]("batch_id"))).toMap
    assert(byId(0L)._1 == 16)   // clamped up to minPad
    assert(byId(1L)._1 == 16)   // boundary: 16 fits in 16
    assert(byId(2L)._1 == 32)   // 17 -> 32
    assert(byId(3L)._1 == 128)
    assert(byId(4L)._1 == 1024) // clamped down to maxPad
    // both 16-bucket docs land in batch 0 (2 docs per batch)
    assert(byId(0L)._2 == 0 && byId(1L)._2 == 0)
  }

  test("one-pass CharEntropyStats matches hand values incl. multi-byte codepoints") {
    import spark.implicits._
    val rows = Seq(
      "zzzz",      // 4 chars, 1 distinct, H = 0 exactly
      "ab",        // H = 1
      "aabb",      // H = 1
      "abcd",      // H = 2
      "éé",        // 2-byte codepoints: 2 chars, 1 distinct, H = 0
      "aé",        // H = 1
      "",          // empty
      "中中文")     // 3-byte codepoints: 3 chars, 2 distinct
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val st = TextFunctions.charEntropyStats(col("t"))
    val got = rows.select(col("id"), st.getField("n_chars"), st.getField("n_distinct"),
        round(st.getField("entropy"), 9))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) == ((4L, 1L, 0.0)))
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((4L, 2L, 1.0)))
    assert(got(3L) == ((4L, 4L, 2.0)))
    assert(got(4L) == ((2L, 1L, 0.0)))
    assert(got(5L) == ((2L, 2L, 1.0)))
    assert(got(6L) == ((0L, 0L, 0.0)))
    val (n, d, h) = got(7L)
    assert(n == 3L && d == 2L)
    // H(2/3, 1/3) = log2(3) - 2/3
    assert(math.abs(h - (math.log(3) / math.log(2) - 2.0 / 3.0)) < 1e-9)
  }

  test("CharEntropyStats maps malformed UTF-8 to U+FFFD deterministically") {
    import spark.implicits._
    // binary -> string cast reinterprets bytes without validation — the
    // one route malformed sequences can reach the expression
    val rows = Seq(
      (0L, Array[Byte](0x61, 0xc3.toByte)),          // 'a' + truncated 2-byte lead
      (1L, Array[Byte](0x80.toByte, 0x61)),          // stray continuation + 'a'
      (2L, Array[Byte](0xe4.toByte, 0x61, 0x61)),    // 3-byte lead, non-continuation inside
      (3L, Array[Byte](0xc3.toByte, 0xa9.toByte)))   // well-formed 'é' control
      .toDF("id", "b")
    val st = TextFunctions.charEntropyStats(col("b").cast("string"))
    val got = rows.select(col("id"), st.getField("n_chars"), st.getField("n_distinct"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == ((2L, 2L)), s"truncated tail: ${got(0L)}") // 'a' + U+FFFD
    assert(got(1L) == ((2L, 2L)), s"stray continuation: ${got(1L)}")
    assert(got(2L) == ((3L, 2L)), s"broken interior: ${got(2L)}") // U+FFFD a a
    assert(got(3L) == ((1L, 1L)), s"well-formed control: ${got(3L)}")
  }

  test("CharEntropyStats equals the explode + double-groupBy spelling on the corpus") {
    import spark.implicits._
    val docs = tables.documents
    val st = TextFunctions.charEntropyStats(col("text"))
    val fast = docs.select(col("doc_id"),
      round(st.getField("entropy").cast(DecimalType(18, 8)), 6).as("h"),
      st.getField("n_distinct").as("nd"))
    val slow = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .filter(col("c") =!= "") // Spark split keeps a trailing empty match
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).cast("double").as("cnt"))
      .groupBy(col("doc_id"))
      .agg(round((log2(sum(col("cnt"))) -
          sum(col("cnt") * log2(col("cnt"))) / sum(col("cnt")))
        .cast(DecimalType(18, 8)), 6).as("h"),
        count(lit(1)).as("nd"))
    assert(fast.exceptAll(slow).count() == 0 && slow.exceptAll(fast).count() == 0)
  }
}
