package graft.edi

import graft.SparkSpec
import graft.fixtures.{ClaimFixtures, Evaluator}
import org.apache.spark.sql.DataFrame

/** Self-contained Q41–Q43 equivalence: the engine's parse+map output over
  * the generated EDI corpus must equal the independent evaluator's expected
  * rows exactly (same check the DuckDB oracle gate runs, executed in-JVM).
  */
class ClaimMappingSpec extends SparkSpec {

  private lazy val docs = {
    ClaimFixtures.writeEdi()
    ClaimMapping.readDocs(spark, ClaimFixtures.EdiDir).cache()
  }

  private def assertSame(actual: DataFrame, expected: DataFrame, name: String): Unit = {
    val a = actual.count()
    val e = expected.count()
    assert(a == e, s"$name row count: engine=$a expected=$e")
    val extra = actual.exceptAll(expected).count()
    val missing = expected.exceptAll(actual).count()
    assert(extra == 0 && missing == 0,
      s"$name mismatch: $extra engine-only rows, $missing expected-only rows")
  }

  test("claims table matches the independent evaluator (Q41)") {
    assertSame(ClaimMapping.claims(spark, docs), Evaluator.expectedClaims(spark), "claims")
  }

  test("claim_services matches the independent evaluator (Q42)") {
    assertSame(ClaimMapping.claimServices(spark, docs),
      Evaluator.expectedServices(spark), "claim_services")
  }

  test("claim_diagnoses matches the independent evaluator (Q43)") {
    assertSame(ClaimMapping.claimDiagnoses(spark, docs),
      Evaluator.expectedDiagnoses(spark), "claim_diagnoses")
  }

  test("engine matches the evaluator on a 10x in-memory corpus (docs 200..2199)") {
    import spark.implicits._
    val specs = (200 until 2200).map(ClaimFixtures.genDoc)
    val rendered = spark.createDataset(specs.map(ClaimFixtures.render))
    val engine = ClaimMapping.claims(spark, ClaimMapping.parseDocs(spark, rendered))
    val expected = spark.createDataFrame(
      spark.sparkContext.parallelize(specs.flatMap(Evaluator.claimRows), 8),
      Evaluator.claimsSchema)
    assertSame(engine, expected, "claims@10x")
    val engineSvc = ClaimMapping.claimServices(spark, ClaimMapping.parseDocs(spark, rendered))
    val expectedSvc = spark.createDataFrame(
      spark.sparkContext.parallelize(specs.flatMap(Evaluator.serviceRows), 8),
      Evaluator.servicesSchema)
    assertSame(engineSvc, expectedSvc, "claim_services@10x")
  }

  test("every F3 legacy fallback branch is exercised by the corpus") {
    val specs = ClaimFixtures.corpus
    val branches = for {
      d <- specs; c <- d.claims; s <- c.services
    } yield
      if (s.lineRef.isDefined) "lineRef"
      else if (s.linePrv.isDefined) "linePrv"
      else if (c.rendering.flatMap(_._2).isDefined) "claimRef"
      else if (c.rendering.flatMap(_._3).isDefined) "claimPrv"
      else "none"
    assert(branches.toSet == Set("lineRef", "linePrv", "claimRef", "claimPrv", "none"))
  }

  test("branch-coverage matrix: both patient routings, all filing codes, disability quals") {
    val specs = ClaimFixtures.corpus
    assert(specs.exists(_.subscriberIsPatient) && specs.exists(!_.subscriberIsPatient))
    assert(specs.map(_.filing).toSet.size >= 6)
    val disQuals = specs.flatMap(_.claims).flatMap(_.disability).map(_._1).toSet
    assert(disQuals == Set("314", "360", "361"))
    assert(specs.flatMap(_.claims).exists(_.services.isEmpty))
    assert(specs.flatMap(_.claims).exists(_.services.flatMap(_.ps1).nonEmpty))
  }
}
