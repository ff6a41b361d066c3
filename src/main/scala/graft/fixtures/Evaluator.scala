package graft.fixtures

import java.sql.Date
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Independent expected-output evaluator for the 837P mapping (SURVEY.md
  * §5.2.2): computes the claims / claim_services / claim_diagnoses rows
  * straight from `ClaimFixtures.DocSpec` in plain Scala — no EDI text, no
  * parser, no Spark column expressions — re-implementing the reference
  * semantics (`lib/hippo_claim_crossover.rb`) a second time so engine bugs
  * can't self-confirm.
  */
object Evaluator {
  import ClaimFixtures._

  private val D8 = DateTimeFormatter.ofPattern("yyyyMMdd")
  private def d8(s: String): Date =
    if (s == null) null else Date.valueOf(LocalDate.parse(s, D8))
  private def d8o(o: Option[String]): Date = o.map(d8).orNull

  /** Snap to 2dp then emit Double, mirroring the engine's
    * `cast(DECIMAL(12,2)).cast("double")` edge conversion exactly. */
  private def money(o: Option[String]): java.lang.Double =
    new java.math.BigDecimal(o.getOrElse("0")).setScale(2).doubleValue()

  /** X2 (hcc:180-186). */
  private def fmtZip(z: String): String =
    if (z == null) null
    else if (z.length == 9) z.substring(0, 5) + "-" + z.substring(5, 9)
    else z.take(5)

  /** X1 (hcc:167-178) — unconditional insert, mirroring the reference. */
  private def fmtDiag(c: String): String =
    if (c == null) null
    else if (c.startsWith("E")) c.take(4) + "." + c.drop(4)
    else c.take(3) + "." + c.drop(3)

  /** X3 (hcc:221-227). */
  private def name(p: PartySpec): String =
    if (p == null) null
    else if (p.person)
      s"${p.last}, ${p.first}" + p.middle.map(m => ", " + m.take(1)).getOrElse("")
    else p.last

  /** C2 (hcc:60-66). */
  private def insType(f: String): String = f match {
    case "MA" | "MB" => "medicare"
    case "MC" => "medicaid"
    case "CH" => "tricare_champus"
    case "VA" => "champva"
    case _ => "other"
  }

  /** C3 (hcc:229-235). */
  private def rel(c: String): String = c match {
    case "01" => "spouse"
    case "19" => "child"
    case _ => "other"
  }

  private def sex(dmg: Option[(String, String)]): String =
    dmg.map { case (_, g) => if (g == "M") "male" else "female" }.orNull

  val asOfDate: Date = Date.valueOf("2026-01-15")

  // ---- claims ------------------------------------------------------------

  def claimRows(d: DocSpec): Seq[Row] = {
    val patientParty = if (d.subscriberIsPatient) d.insured else d.patient.orNull
    val firstOther = d.claims.head.others.headOption
    d.claims.zipWithIndex.map { case (c, i) =>
      val lab = c.services.flatMap(_.ps1).map(_.toDouble).sum
      val disPair: (Date, Date) = c.disability match {
        case Some((_, None)) => (null, null)
        case Some(("314", Some(v))) =>
          val parts = v.split("-"); (d8(parts(0)), d8(parts(1)))
        case Some(("360", Some(v))) => (d8(v), null)
        case Some(("361", Some(v))) => (null, d8(v))
        case _ => (null, null)
      }
      Row(
        s"${d.docId}-${i + 1}",
        name(d.billing),
        d.billing.id.orNull,
        d.billing.address.orNull,
        d.billing.n4.map(_._1).orNull,
        d.billing.n4.map(_._2).orNull,
        d.billing.n4.map(n => fmtZip(n._3)).orNull,
        d.taxQual.flatMap(_ => d.taxId).orNull,
        d.taxQual.map(q => if (q == "SY") "ssn" else "ein").orNull,
        d.phone.orNull,
        d.payer.last, // raw org name, not get_name (hcc:50)
        d.payer.address.orNull,
        d.payer.n4.map(_._1).orNull,
        d.payer.n4.map(_._2).orNull,
        d.payer.n4.map(n => fmtZip(n._3)).orNull,
        insType(d.filing),
        name(d.insured),
        d.insured.id.orNull,
        d.insured.address.orNull,
        d.insured.n4.map(_._1).orNull,
        d.insured.n4.map(_._2).orNull,
        d.insured.n4.map(n => fmtZip(n._3)).orNull,
        d8o(d.insured.dmg.map(_._1)),
        sex(d.insured.dmg),
        d.groupName.orNull,
        d.groupNumber.orNull,
        firstOther.map(o => name(o.insured)).orNull,
        if (d.subscriberIsPatient) "self" else rel(d.patientRel.orNull),
        name(patientParty),
        Option(patientParty).flatMap(_.address).orNull,
        Option(patientParty).flatMap(_.n4).map(_._1).orNull,
        Option(patientParty).flatMap(_.n4).map(_._2).orNull,
        Option(patientParty).flatMap(_.n4).map(n => fmtZip(n._3)).orNull,
        d8o(Option(patientParty).flatMap(_.dmg).map(_._1)),
        Option(patientParty).map(p => sex(p.dmg)).orNull,
        asOfDate,
        "Signature on File",
        "Signature on File",
        d8o(c.services.headOption.map(_.date)),
        c.others.nonEmpty,
        c.others.headOption.flatMap(_.groupNumber).orNull,
        c.others.headOption.flatMap(_.groupName).orNull,
        c.note.orNull,
        d8o(c.accident),
        d8o(c.admit),
        d8o(c.discharge),
        c.priorAuth.orElse(c.extraRef.map(_._2)).orNull, // first claim REF wins (hcc:116)
        c.acct,
        c.acceptAssign == "A",
        if (c.provSig == "Y") "Signature on File" else "",
        disPair._1,
        disPair._2,
        fmtDiag(c.diag(0).orNull),
        fmtDiag(c.diag(1).orNull),
        fmtDiag(c.diag(2).orNull),
        fmtDiag(c.diag(3).orNull),
        c.rc1.contains("EM") || c.rc2.isDefined,
        c.rc1.contains("AA") || c.rc2.isDefined,
        c.rc1.contains("OA") || c.rc2.isDefined,
        c.clmState.orNull,
        c.referring.map(r => name(r._1)).orNull,
        c.referring.flatMap(_._1.id).orNull,
        c.referring.flatMap(_._2).map(_._1).orNull,
        c.referring.flatMap(_._2).map(_._2).orNull,
        c.facilityParty.map(name).orNull,
        c.facilityParty.flatMap(_.id).orNull,
        c.facilityParty.flatMap(_.address).orNull,
        c.facilityParty.flatMap(_.n4).map(_._1).orNull,
        c.facilityParty.flatMap(_.n4).map(_._2).orNull,
        c.facilityParty.flatMap(_.n4).map(n => fmtZip(n._3)).orNull,
        lab > 0,
        // BigDecimal.valueOf = Double.toString-based, matching Spark's
        // double->decimal cast (shortest-repr, HALF_UP) before the double edge
        if (lab > 0) java.math.BigDecimal.valueOf(lab)
          .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue(): java.lang.Double
        else null)
    }
  }

  private def strField(n: String) = StructField(n, StringType)
  private def dateField(n: String) = StructField(n, DateType)
  private def boolField(n: String) = StructField(n, BooleanType)
  private def moneyField(n: String) = StructField(n, DoubleType)

  val claimsSchema: StructType = StructType(Seq(
    strField("claim_id"),
    strField("billing_provider_name"), strField("billing_provider_npi"),
    strField("billing_provider_address"), strField("billing_provider_city"),
    strField("billing_provider_state"), strField("billing_provider_zip"),
    strField("federal_tax_id"), strField("federal_tax_id_type"),
    strField("billing_provider_phone"),
    strField("carrier_name"), strField("carrier_address_1"),
    strField("carrier_city"), strField("carrier_state"), strField("carrier_zip"),
    strField("insurance_type"),
    strField("insured_name"), strField("insured_id_number"),
    strField("insured_address"), strField("insured_city"),
    strField("insured_state"), strField("insured_zip"),
    dateField("insured_date_of_birth"), strField("insured_sex"),
    strField("insured_insurance_plan_or_program_name"),
    strField("insured_policy_or_group_number"),
    strField("other_insured_name"),
    strField("patient_relationship_to_insured"),
    strField("patient_name"), strField("patient_address"),
    strField("patient_city"), strField("patient_state"), strField("patient_zip"),
    dateField("patient_date_of_birth"), strField("patient_sex"),
    dateField("provider_signature_date"),
    strField("insured_or_authorized_signature"),
    strField("patient_or_authorized_signature"),
    dateField("patient_or_authorized_signature_date"),
    boolField("insured_other_health_benefit_plan_exists"),
    strField("other_insured_policy_or_group_number"),
    strField("other_insured_plan_or_program_name"),
    strField("condition_reserved_for_local_use"),
    dateField("incident_date"), dateField("admit_date"), dateField("discharge_date"),
    strField("prior_authorization_number"), strField("patient_account_number"),
    boolField("accepts_assignment"), strField("provider_signature"),
    dateField("dates_unable_to_work_from"), dateField("dates_unable_to_work_to"),
    strField("diagnosis_code_1"), strField("diagnosis_code_2"),
    strField("diagnosis_code_3"), strField("diagnosis_code_4"),
    boolField("condition_related_to_employment"),
    boolField("condition_related_to_auto_accident"),
    boolField("condition_related_to_other_accident"),
    strField("condition_place"),
    strField("referring_provider_name"), strField("referring_provider_npi"),
    strField("referring_provider_other_identifier"),
    strField("referring_provider_other_number"),
    strField("service_facility_name"), strField("service_facility_npi"),
    strField("service_facility_address"), strField("service_facility_city"),
    strField("service_facility_state"), strField("service_facility_zip"),
    boolField("outside_lab"), moneyField("outside_lab_charges")))

  // ---- claim_services ----------------------------------------------------

  def serviceRows(d: DocSpec): Seq[Row] =
    d.claims.zipWithIndex.flatMap { case (c, i) =>
      c.services.zipWithIndex.map { case (s, j) =>
        // F3 (hcc:245-259); a REF rendered without an id is skipped — the
        // reference guards on ReferenceIdentification, not the segment
        val (legQ, legN): (String, String) = s.lineRef.filter(_._2.nonEmpty) match {
          case Some((q, v)) => (q, v)
          case None => s.linePrv match {
            case Some(v) => ("ZZ", v)
            case None => c.rendering.flatMap(_._2).filter(_._2.nonEmpty) match {
              case Some((q, v)) => (q, v)
              case None => ("ZZ", c.rendering.flatMap(_._3).orNull)
            }
          }
        }
        Row(
          s"${d.docId}-${i + 1}",
          j + 1,
          d8(s.date),
          s.facility.orElse(c.facility).orNull, // F1 (hcc:237-243)
          "",
          s.proc,
          s.mods.lift(0).orNull, s.mods.lift(1).orNull,
          s.mods.lift(2).orNull, s.mods.lift(3).orNull,
          s.pointers.mkString(""), // X4 join-skips-nils (hcc:199)
          money(s.charge),
          s.units.map(_.toInt).getOrElse(0),
          "",
          s.lineNpi.orElse(c.referring.flatMap(_._1.id)).orNull, // F2 (hcc:261-267)
          legQ, legN,
          s.desc.orNull,
          money(s.svd))
      }
    }

  val servicesSchema: StructType = StructType(Seq(
    strField("claim_id"), StructField("line_no", IntegerType),
    dateField("date_of_service_from"),
    strField("place_of_service"), strField("emergency"),
    strField("procedure_code"),
    strField("modifier_1"), strField("modifier_2"),
    strField("modifier_3"), strField("modifier_4"),
    strField("diagnosis_pointer"), moneyField("charges"),
    StructField("days_or_units", IntegerType), strField("epsdt_family_plan"),
    strField("npi_number"), strField("legacy_number_qualifier"),
    strField("legacy_number"), strField("description"),
    moneyField("service_paid_amount")))

  // ---- claim_diagnoses ---------------------------------------------------

  def diagnosisRows(d: DocSpec): Seq[Row] =
    d.claims.zipWithIndex.flatMap { case (c, i) =>
      c.diag.zipWithIndex.collect { case (Some(code), slot) =>
        Row(s"${d.docId}-${i + 1}", slot + 1, fmtDiag(code))
      }
    }

  val diagnosesSchema: StructType = StructType(Seq(
    strField("claim_id"), StructField("slot", IntegerType), strField("icd9_code")))

  // ---- media features (L5 oracle: the stub featurizer re-computed in ----
  // plain Scala straight from the rendered fixture bytes) ------------------

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  def mediaFeatureRows(d: DocSpec): Row = {
    val bytes = ClaimFixtures.render(d).getBytes("UTF-8")
    // byte histogram, float arithmetic in the same order as the engine stub
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) % 16) += 1f; i += 1 }
    val total = math.max(1f, bytes.length.toFloat)
    var j = 0
    while (j < 16) { hist(j) /= total; j += 1 }
    var s = 0.0
    j = 0
    while (j < 16) { s += hist(j); j += 1 }
    val kind =
      if (bytes.length >= 2 && bytes(0) == 'S' && bytes(1) == 'T') "x12" else "bin"
    Row(s"${d.docId}.txt", bytes.length.toLong, kind,
      round4(hist(0).toDouble), round4(s))
  }

  val mediaFeaturesSchema: StructType = StructType(Seq(
    strField("file_name"), StructField("n_bytes", LongType), strField("kind"),
    StructField("f0", DoubleType), StructField("feature_sum", DoubleType)))

  def expectedMediaFeatures(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(corpus.map(mediaFeatureRows), 2), mediaFeaturesSchema)

  // ---- media manifest (L5 oracle: expected bytes/hashes per EDI file) ----

  def manifestRows(d: DocSpec): Row = {
    val bytes = ClaimFixtures.render(d).getBytes("UTF-8")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    Row(s"${d.docId}.txt", bytes.length.toLong, hex)
  }

  val manifestSchema: StructType = StructType(Seq(
    strField("file_name"), StructField("n_bytes", LongType), strField("sha256")))

  def expectedManifest(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(corpus.map(manifestRows), 2), manifestSchema)

  // ---- materialization ---------------------------------------------------

  def expectedClaims(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(corpus.flatMap(claimRows), 4), claimsSchema)

  def expectedServices(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(corpus.flatMap(serviceRows), 4), servicesSchema)

  def expectedDiagnoses(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(corpus.flatMap(diagnosisRows), 4), diagnosesSchema)
}
