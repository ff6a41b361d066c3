package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NormalizeUnicode

/** Unicode normalization expression (q90). */
class NormalizeUnicodeSpec extends SparkSpec {

  import spark.implicits._

  private val decomposed = "café" // e + combining acute, 5 code points
  private val precomposed = "café" // U+00E9, 4 code points

  test("NFC composes decomposed sequences; precomposed text is unchanged") {
    val out = Seq(
      (decomposed, "decomposed"),
      (precomposed, "precomposed"),
      ("plain ascii", "ascii"),
      (null.asInstanceOf[String], "null"),
    ).toDF("t", "tag")
      .select($"tag", TextFunctions.nfc($"t").as("n"), length($"t").as("lr"),
        length(TextFunctions.nfc($"t")).as("ln"))
      .as[(String, String, Option[Int], Option[Int])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("decomposed")._2 == precomposed)
    assert(out("decomposed")._3.contains(5) && out("decomposed")._4.contains(4))
    assert(out("precomposed")._2 == precomposed)
    assert(out("ascii")._2 == "plain ascii")
    assert(out("null")._2 == null)
  }

  test("all four forms follow Normalizer semantics") {
    val df = Seq("Å ﬁne").toDF("t") // precomposed Å, fi ligature
    val row = df.select(
      NormalizeUnicode.column($"t", "NFD").as("nfd"),
      NormalizeUnicode.column($"t", "NFC").as("nfc"),
      NormalizeUnicode.column($"t", "NFKC").as("nfkc"),
      NormalizeUnicode.column($"t", "NFKD").as("nfkd"),
    ).as[(String, String, String, String)].head()
    assert(row._1 == "Å ﬁne", "NFD decomposes the ring, keeps the ligature")
    assert(row._2 == "Å ﬁne", "NFC recomposes")
    assert(row._3 == "Å fine", "NFKC expands the compatibility ligature")
    assert(row._4 == "Å fine")
  }

  test("unknown form is rejected at construction") {
    intercept[IllegalArgumentException] {
      NormalizeUnicode.column(lit("x"), "NFX")
    }
  }

  test("registered SQL function matches the Column API") {
    graft.GraftExtensions.install(spark)
    val viaSql = spark.sql(s"SELECT nfc_normalize('$decomposed') AS n")
      .as[String].head()
    assert(viaSql == precomposed)
  }
}
