package graft.edi

import graft.functions.ClaimFunctions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The 837P -> CMS-1500 "crossover" mapping (`lib/hippo_claim_crossover.rb`
  * `to_claim`, hcc:15-20) re-expressed as Spark column expressions over the
  * parsed `Dataset[ClaimDoc]`.
  *
  * Everything here is narrow (explode + projections — G1/G2 keep lineage, no
  * shuffle); the one aggregation in the reference (lab charges, hcc:209-211)
  * is computed pre-explode with `aggregate()` over the still-nested services
  * array, so the whole mapping is shuffle-free end to end (SURVEY.md §3.4).
  *
  * Output tables (SURVEY.md §1.3 / FIXTURES.md §3):
  *  - `claims`          one row per 2300 loop (~60 CMS-1500 columns)
  *  - `claim_services`  one row per 2400 loop (FK claim_id)
  *  - `claim_diagnoses` one row per populated HI slot (FK claim_id)
  */
object ClaimMapping {

  val MoneyType: DecimalType = DecimalType(12, 2)

  /** Config key for the reference's `Date.today` (hcc:105), injected for
    * determinism (SURVEY X6). */
  val AsOfKey = "graft.as_of_date"
  val AsOfDefault = "2026-01-15"

  /** Parse raw documents in a narrow mapPartitions stage (S2). Each input
    * string may be a bare 837 transaction or a full ISA/GS interchange
    * carrying many ST..SE transactions — the flatMap split keeps one file
    * -> N ClaimDocs without any shuffle. */
  def parseDocs(spark: SparkSession, raw: Dataset[String]): Dataset[ClaimDoc] = {
    import spark.implicits._
    raw.mapPartitions(_.flatMap(d =>
      Edi837Parser.splitInterchange(d).iterator.map(Edi837Parser.parse)))
  }

  /** Read whole-file EDI text (S1) and parse; one file may carry a full
    * multi-transaction interchange. */
  def readDocs(spark: SparkSession, dir: String): Dataset[ClaimDoc] = {
    import spark.implicits._
    parseDocs(spark, spark.read.option("wholetext", "true").textFile(dir))
  }

  // ---- shared sub-expressions ------------------------------------------

  /** Null-safe array access (try_element_at: out-of-bounds -> null even
    * under Spark 4's default ANSI mode). */
  private def elemAt(c: Column, i: Int): Column = try_element_at(c, lit(i))

  /** hcc:298-300 — 2000B HL child code "0" means the subscriber IS the patient. */
  private def patientIsSubscriber: Column = col("subscriberChildCode") === "0"

  /** DTP lookup by qualifier (P3 `find_by_name`): first matching claim-level
    * DTP's value, null when absent. */
  private def dtpValue(c: Column, qual: String): Column =
    elemAt(filter(c.getField("dtps"), d => d.getField("qual") === qual), 1).getField("value")

  /** Money parse mirroring Ruby `.to_f` (nil -> 0.0): snap to the 2dp
    * decimal grid, then emit DOUBLE (final outputs are never DECIMAL — the
    * driver's hash canonicalization is float-repr based; see graft.Canon). */
  private def toMoney(c: Column): Column =
    coalesce(c.cast("double"), lit(0.0)).cast(MoneyType).cast("double")

  /** DMG-guarded sex mapping (hcc:294/306-308): M -> male else female, but
    * only when the DMG segment exists at all. */
  private def sexOf(dmg: Column): Column =
    when(dmg.isNull, lit(null).cast("string"))
      .otherwise(when(dmg.getField("gender") === "M", "male").otherwise("female"))

  /** C2 insurance type (hcc:60-66). */
  private def insuranceType(filing: Column): Column =
    when(filing.isin("MA", "MB"), "medicare")
      .when(filing === "MC", "medicaid")
      .when(filing === "CH", "tricare_champus")
      .when(filing === "VA", "champva")
      .otherwise("other")

  /** C3 relationship (hcc:229-235). */
  private def relationship(code: Column): Column =
    when(code === "01", "spouse").when(code === "19", "child").otherwise("other")

  /** F3 legacy qualifier+number 4-level fallback (hcc:245-259): a CASE over
    * isNotNull tests yielding a (qual, num) struct — not a plain coalesce,
    * because the qualifier depends on which branch won. */
  private def legacy(svc: Column, claim: Column): Column = {
    val lineRef = svc.getField("l2420a").getField("ref")
    val linePrv = svc.getField("l2420a").getField("prvId")
    val claimRef = claim.getField("l2310b").getField("ref")
    val claimPrv = claim.getField("l2310b").getField("prvId")
    when(lineRef.getField("id").isNotNull,
      struct(lineRef.getField("qual").as("q"), lineRef.getField("id").as("n")))
      .when(linePrv.isNotNull, struct(lit("ZZ").as("q"), linePrv.as("n")))
      .when(claimRef.getField("id").isNotNull,
        struct(claimRef.getField("qual").as("q"), claimRef.getField("id").as("n")))
      .otherwise(struct(lit("ZZ").as("q"), claimPrv.as("n")))
  }

  /** A1 computed pre-explode: sum of PS1 lab amounts over the nested
    * services array (hcc:209) — `aggregate()` keeps this shuffle-free. */
  private def labCharges(c: Column): Column =
    aggregate(c.getField("services"), lit(0.0),
      (acc, s) => acc + coalesce(s.getField("ps1Amount").cast("double"), lit(0.0)))

  private def asOf(spark: SparkSession): Column =
    to_date(lit(spark.conf.get(AsOfKey, AsOfDefault)))

  // ---- claims (one row per 2300, hcc:22-164 + 214-308) ------------------

  def claims(spark: SparkSession, docs: Dataset[ClaimDoc]): DataFrame = {
    val exploded = docs.toDF()
      .select(col("*"), posexplode(col("claims")).as(Seq("ord", "c")))
    val c = col("c")
    val clm = c.getField("clm")
    val patientParty = when(patientIsSubscriber, col("insured")).otherwise(col("patient"))
    val taxRef = elemAt(
      filter(col("billing.refs"), r => r.getField("qual").isin("SY", "EI")), 1)
    // hcc:89 — other insured comes from the FIRST claim loop's first 2320,
    // set once per document before the per-2300 loop.
    val firstOtherIns = elemAt(
      elemAt(col("claims"), 1).getField("l2320s"), 1).getField("otherInsured")
    val disability = elemAt(
      filter(c.getField("dtps"), d => d.getField("qual").isin("314", "360", "361")), 1)
    val disVal = disability.getField("value")
    // C5 qualifier-driven pair split (hcc:124-133); RD8 ranges are
    // "CCYYMMDD-CCYYMMDD". `next if nil` -> both null when value absent.
    val disPair = when(disVal.isNull, struct(lit(null).cast("string").as("f"), lit(null).cast("string").as("t")))
      .when(disability.getField("qual") === "314",
        struct(split(disVal, "-").getItem(0).as("f"), split(disVal, "-").getItem(1).as("t")))
      .when(disability.getField("qual") === "360", struct(disVal.as("f"), lit(null).cast("string").as("t")))
      .otherwise(struct(lit(null).cast("string").as("f"), disVal.as("t")))
    val rc1 = clm.getField("relatedCause1")
    val rc2 = clm.getField("relatedCause2")
    val lab = labCharges(c)

    exploded.select(
      concat(col("docId"), lit("-"), col("ord") + 1).as("claim_id"),
      // billing provider (hcc:23-45)
      getName(col("billing.nm1")).as("billing_provider_name"),
      col("billing.nm1.id").as("billing_provider_npi"),
      col("billing.address").as("billing_provider_address"),
      col("billing.city").as("billing_provider_city"),
      col("billing.state").as("billing_provider_state"),
      formatPostalCode(col("billing.zip")).as("billing_provider_zip"),
      taxRef.getField("id").as("federal_tax_id"),
      when(taxRef.isNull, lit(null).cast("string"))
        .otherwise(when(taxRef.getField("qual") === "SY", "ssn").otherwise("ein"))
        .as("federal_tax_id_type"),
      col("billing.phone").as("billing_provider_phone"),
      // carrier (hcc:49-58; name is the raw org name, not get_name)
      col("payer.nm1.last").as("carrier_name"),
      col("payer.address").as("carrier_address_1"),
      col("payer.city").as("carrier_city"),
      col("payer.state").as("carrier_state"),
      formatPostalCode(col("payer.zip")).as("carrier_zip"),
      insuranceType(col("sbr.filingCode")).as("insurance_type"),
      // insured (hcc:69-87)
      getName(col("insured.nm1")).as("insured_name"),
      col("insured.nm1.id").as("insured_id_number"),
      col("insured.address").as("insured_address"),
      col("insured.city").as("insured_city"),
      col("insured.state").as("insured_state"),
      formatPostalCode(col("insured.zip")).as("insured_zip"),
      x12Date(col("insured.dmg.date")).as("insured_date_of_birth"),
      sexOf(col("insured.dmg")).as("insured_sex"),
      col("sbr.groupName").as("insured_insurance_plan_or_program_name"),
      col("sbr.groupNumber").as("insured_policy_or_group_number"),
      getName(firstOtherIns).as("other_insured_name"),
      // patient routing C7 (hcc:91-97): column-level branch, not control flow
      when(patientIsSubscriber, lit("self"))
        .otherwise(relationship(col("patientRel")))
        .as("patient_relationship_to_insured"),
      getName(patientParty.getField("nm1")).as("patient_name"),
      patientParty.getField("address").as("patient_address"),
      patientParty.getField("city").as("patient_city"),
      patientParty.getField("state").as("patient_state"),
      formatPostalCode(patientParty.getField("zip")).as("patient_zip"),
      x12Date(patientParty.getField("dmg").getField("date")).as("patient_date_of_birth"),
      sexOf(patientParty.getField("dmg")).as("patient_sex"),
      // claim header (hcc:105-119)
      asOf(spark).as("provider_signature_date"),
      lit("Signature on File").as("insured_or_authorized_signature"),
      lit("Signature on File").as("patient_or_authorized_signature"),
      x12Date(elemAt(c.getField("services"), 1).getField("serviceDate"))
        .as("patient_or_authorized_signature_date"),
      (size(c.getField("l2320s")) > 0)
        .as("insured_other_health_benefit_plan_exists"),
      elemAt(c.getField("l2320s"), 1).getField("sbr").getField("groupNumber")
        .as("other_insured_policy_or_group_number"),
      elemAt(c.getField("l2320s"), 1).getField("sbr").getField("groupName")
        .as("other_insured_plan_or_program_name"),
      c.getField("note").as("condition_reserved_for_local_use"),
      x12Date(dtpValue(c, "439")).as("incident_date"),
      x12Date(dtpValue(c, "435")).as("admit_date"),
      x12Date(dtpValue(c, "096")).as("discharge_date"),
      c.getField("priorAuth").as("prior_authorization_number"),
      clm.getField("accountNumber").as("patient_account_number"),
      coalesce(clm.getField("acceptAssignment") === "A", lit(false)).as("accepts_assignment"),
      when(clm.getField("providerSignature") === "Y", "Signature on File").otherwise("")
        .as("provider_signature"),
      x12Date(disPair.getField("f")).as("dates_unable_to_work_from"),
      x12Date(disPair.getField("t")).as("dates_unable_to_work_to"),
      // diagnosis slots (hcc:136-139)
      formatDiagnosisCode(elemAt(c.getField("diag"), 1)).as("diagnosis_code_1"),
      formatDiagnosisCode(elemAt(c.getField("diag"), 2)).as("diagnosis_code_2"),
      formatDiagnosisCode(elemAt(c.getField("diag"), 3)).as("diagnosis_code_3"),
      formatDiagnosisCode(elemAt(c.getField("diag"), 4)).as("diagnosis_code_4"),
      // C6 condition flags (hcc:214-219): `c1 == X || c2` with Ruby string
      // truthiness -> engine boolean `c1 = X OR c2 IS NOT NULL`
      coalesce(rc1 === "EM" || rc2.isNotNull, lit(false)).as("condition_related_to_employment"),
      coalesce(rc1 === "AA" || rc2.isNotNull, lit(false)).as("condition_related_to_auto_accident"),
      coalesce(rc1 === "OA" || rc2.isNotNull, lit(false)).as("condition_related_to_other_accident"),
      clm.getField("state").as("condition_place"),
      // referring provider (hcc:143-148)
      getName(c.getField("l2310a").getField("nm1")).as("referring_provider_name"),
      c.getField("l2310a").getField("nm1").getField("id").as("referring_provider_npi"),
      c.getField("l2310a").getField("ref").getField("qual").as("referring_provider_other_identifier"),
      c.getField("l2310a").getField("ref").getField("id").as("referring_provider_other_number"),
      // service facility (hcc:150-160)
      getName(c.getField("l2310c").getField("nm1")).as("service_facility_name"),
      c.getField("l2310c").getField("nm1").getField("id").as("service_facility_npi"),
      c.getField("l2310c").getField("address").as("service_facility_address"),
      c.getField("l2310c").getField("city").as("service_facility_city"),
      c.getField("l2310c").getField("state").as("service_facility_state"),
      formatPostalCode(c.getField("l2310c").getField("zip")).as("service_facility_zip"),
      // outside lab (hcc:209-211): charges only set when > 0
      (lab > 0).as("outside_lab"),
      when(lab > 0, lab.cast(MoneyType).cast("double")).otherwise(lit(null).cast("double"))
        .as("outside_lab_charges"))
  }

  // ---- claim_services (one row per 2400, hcc:188-212) -------------------

  def claimServices(spark: SparkSession, docs: Dataset[ClaimDoc]): DataFrame = {
    val exploded = docs.toDF()
      .select(col("docId"), posexplode(col("claims")).as(Seq("ord", "c")))
      .select(col("docId"), col("ord"), col("c"),
        posexplode(col("c.services")).as(Seq("lineOrd", "s")))
    val s = col("s")
    val sv1 = s.getField("sv1")
    val leg = legacy(s, col("c"))
    exploded.select(
      concat(col("docId"), lit("-"), col("ord") + 1).as("claim_id"),
      (col("lineOrd") + 1).as("line_no"),
      x12Date(s.getField("serviceDate")).as("date_of_service_from"),
      // F1 2-level fallback (hcc:237-243)
      coalesce(sv1.getField("facilityCode"), col("c.clm.facilityCode")).as("place_of_service"),
      lit("").as("emergency"),
      sv1.getField("procCode").as("procedure_code"),
      sv1.getField("m1").as("modifier_1"),
      sv1.getField("m2").as("modifier_2"),
      sv1.getField("m3").as("modifier_3"),
      sv1.getField("m4").as("modifier_4"),
      // hcc:199 — Ruby Array#join skips nils, concat_ws matches (X4)
      concat_ws("", sv1.getField("p1"), sv1.getField("p2"), sv1.getField("p3"), sv1.getField("p4"))
        .as("diagnosis_pointer"),
      toMoney(sv1.getField("amount")).as("charges"),
      coalesce(sv1.getField("quantity").cast("int"), lit(0)).as("days_or_units"),
      lit("").as("epsdt_family_plan"),
      // F2 2-level NPI fallback: line 2420A else claim 2310A (hcc:261-267)
      coalesce(s.getField("l2420a").getField("nm1").getField("id"),
        col("c.l2310a.nm1.id")).as("npi_number"),
      leg.getField("q").as("legacy_number_qualifier"),
      leg.getField("n").as("legacy_number"),
      sv1.getField("desc").as("description"),
      toMoney(s.getField("svdAmount")).as("service_paid_amount"))
  }

  // ---- claim_diagnoses (G4 un-pivot of HI slots, hcc:136-139) -----------

  def claimDiagnoses(spark: SparkSession, docs: Dataset[ClaimDoc]): DataFrame = {
    docs.toDF()
      .select(col("docId"), posexplode(col("claims")).as(Seq("ord", "c")))
      .select(
        concat(col("docId"), lit("-"), col("ord") + 1).as("claim_id"),
        posexplode(col("c.diag")).as(Seq("slotOrd", "code")))
      .filter(col("code").isNotNull)
      .select(col("claim_id"), (col("slotOrd") + 1).as("slot"),
        formatDiagnosisCode(col("code")).as("icd9_code"))
  }
}
