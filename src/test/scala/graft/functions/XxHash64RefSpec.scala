package graft.functions

import graft.SparkSpec
import graft.fixtures.XxHash64Ref
import org.apache.spark.sql.functions._

/** The plain-Scala XXH64 oracle must agree with the engine's `xxhash64`
  * expression on every composition the fingerprint uses — otherwise the
  * q44b differential check would be comparing two different algorithms.
  */
class XxHash64RefSpec extends SparkSpec {

  private val samples = Seq(
    "", "a", "ab", "abc", "abcd", "abcde", "0123456", "01234567", "012345678",
    "exactly-fifteen", "exactly-sixteen!", "a-rather-longer-token-string",
    "a 32+ byte string to hit the four-lane stripe path of xxh64!!",
    "ünïcødé tøkêns — 中文字符 and emoji 🦜 mixed in")

  test("hashBytes matches Spark xxhash64(string) for all tail/stripe shapes") {
    import spark.implicits._
    val fromSpark = samples.toDF("s")
      .select(xxhash64(col("s")).as("h")).collect().map(_.getLong(0))
    val fromRef = samples.map(s => XxHash64Ref.hashBytes(s.getBytes("UTF-8"), 42L))
    assert(fromSpark.toSeq == fromRef)
  }

  test("chain matches Spark xxhash64(long, string)") {
    import spark.implicits._
    val accs = Seq(0L, 1L, -1L, Long.MaxValue, 42L, 7896543210L)
    val pairs = for (a <- accs; s <- samples) yield (a, s)
    val fromSpark = pairs.toDF("acc", "s")
      .select(xxhash64(col("acc"), col("s")).as("h")).collect().map(_.getLong(0))
    val fromRef = pairs.map { case (a, s) => XxHash64Ref.chain(a, s) }
    assert(fromSpark.toSeq == fromRef)
  }

  test("fingerprint fold matches TextFunctions.fingerprint on real documents") {
    import spark.implicits._
    val docs = tables.documents.select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(50)
      .as[(Long, String)].collect()
    val fromSpark = tables.documents
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id")).limit(50)
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(fromSpark(id) == XxHash64Ref.fingerprint(text), s"doc $id")
    }
  }
}
