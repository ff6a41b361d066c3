package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage for the reference scalar functions X1–X3 (SURVEY.md
  * §5.2.3), evaluated through the actual column expressions. ScalaCheck
  * generators are driven manually (no scalatest bridge offline) and each
  * property evaluates its whole sample set in one Spark job.
  */
class ClaimFunctionsSpec extends SparkSpec {

  private def evalStr(c: org.apache.spark.sql.Column): String =
    spark.range(1).select(c.as("v")).collect()(0).getAs[String]("v")

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("X1 format_diagnosis_code: E-codes split at 4, others at 3, null passes") {
    assert(evalStr(ClaimFunctions.formatDiagnosisCode(lit("E8509"))) == "E850.9")
    assert(evalStr(ClaimFunctions.formatDiagnosisCode(lit("V5431"))) == "V54.31")
    assert(evalStr(ClaimFunctions.formatDiagnosisCode(lit("12345"))) == "123.45")
    // the reference inserts unconditionally — short codes keep the dot
    assert(evalStr(ClaimFunctions.formatDiagnosisCode(lit("123"))) == "123.")
    assert(evalStr(ClaimFunctions.formatDiagnosisCode(lit(null).cast("string"))) == null)
  }

  test("X1 property: output is input with one dot inserted at the rule position") {
    import spark.implicits._
    val digits = Gen.choose(3, 6).flatMap(n => Gen.listOfN(n, Gen.numChar).map(_.mkString))
    val codes = samples(Gen.oneOf(digits, digits.map("E" + _), digits.map("V" + _)), 200)
    val out = codes.toDF("code")
      .select($"code", ClaimFunctions.formatDiagnosisCode($"code").as("fmt"))
      .as[(String, String)].collect()
    out.foreach { case (code, fmt) =>
      val idx = if (code.startsWith("E")) 4 else 3
      assert(fmt == code.take(idx) + "." + code.drop(idx), s"code=$code")
    }
  }

  test("X2 format_postal_code: 9 digits dashed, else first five") {
    assert(evalStr(ClaimFunctions.formatPostalCode(lit("941041234"))) == "94104-1234")
    assert(evalStr(ClaimFunctions.formatPostalCode(lit("94104"))) == "94104")
    assert(evalStr(ClaimFunctions.formatPostalCode(lit("9410"))) == "9410")
    assert(evalStr(ClaimFunctions.formatPostalCode(lit(null).cast("string"))) == null)
  }

  test("X2 property: 5-vs-9 digit shapes") {
    import spark.implicits._
    val zips = samples(Gen.oneOf(
      Gen.listOfN(5, Gen.numChar).map(_.mkString),
      Gen.listOfN(9, Gen.numChar).map(_.mkString)), 100)
    val out = zips.toDF("z")
      .select($"z", ClaimFunctions.formatPostalCode($"z").as("fmt"))
      .as[(String, String)].collect()
    out.foreach { case (z, fmt) =>
      val expected = if (z.length == 9) z.take(5) + "-" + z.drop(5) else z.take(5)
      assert(fmt == expected, s"zip=$z")
    }
  }

  test("X3 get_name: person formats Last, First[, M-initial]; org passes through") {
    def name(et: String, last: String, first: String, middle: String): String =
      evalStr(ClaimFunctions.getName(lit(et), lit(last), lit(first),
        if (middle == null) lit(null).cast("string") else lit(middle)))
    assert(name("1", "SMITH", "JOHN", "QUINCY") == "SMITH, JOHN, Q")
    assert(name("1", "SMITH", "JOHN", null) == "SMITH, JOHN")
    assert(name("2", "ACME ORG", null, null) == "ACME ORG")
  }
}
