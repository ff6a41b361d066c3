package graft.fixtures

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.util.Random

/** Deterministic 837P fixture corpus (SURVEY.md §5.2.2 / FIXTURES.md §2).
  *
  * Each document is described by a `DocSpec` — a pure-data record of every
  * branch choice — from which two INDEPENDENT artifacts are derived:
  *
  *   1. `render(spec)`  -> the X12 EDI text the engine must parse, and
  *   2. `Evaluator`     -> the expected claims/claim_services/claim_diagnoses
  *                         rows, computed directly from the spec in plain
  *                         Scala (never through the engine's parser or
  *                         column expressions).
  *
  * Q41–Q43 then compare the engine's parse+map output against the evaluator's
  * expected parquet via DuckDB — any disagreement is an engine bug (or an
  * evaluator bug, which independent implementation makes visible).
  *
  * Branch coverage follows the FIXTURES.md §2 matrix: person/org names,
  * 5/9-digit zips, E/V/numeric/short/absent diagnosis codes, every filing
  * code, every relationship code, disability qualifiers 314/360/361/absent,
  * patient=subscriber both ways, all four legacy fallback branches,
  * PER-TE present/absent, 0..2 2320 loops, 0..3 service lines, zero and
  * positive PS1 lab totals.
  */
object ClaimFixtures {

  // ---- spec model --------------------------------------------------------

  final case class PartySpec(
      person: Boolean, last: String, first: String, middle: Option[String],
      idQual: String, id: Option[String],
      address: Option[String], n4: Option[(String, String, String)], // city, state, zip
      dmg: Option[(String, String)]) // dob CCYYMMDD, gender M/F

  final case class SvcSpec(
      date: String, proc: String, mods: Seq[String], pointers: Seq[String],
      charge: Option[String], units: Option[String], facility: Option[String],
      desc: Option[String], ps1: Option[String], svd: Option[String],
      has2420a: Boolean, lineNpi: Option[String],
      lineRef: Option[(String, String)], linePrv: Option[String])

  final case class OtherSpec(groupNumber: Option[String], groupName: Option[String],
      insured: PartySpec)

  final case class Claim2300Spec(
      acct: String, amount: String, facility: Option[String],
      provSig: String, acceptAssign: String,
      rc1: Option[String], rc2: Option[String], clmState: Option[String],
      diag: Seq[Option[String]], // 4 slots
      accident: Option[String], admit: Option[String], discharge: Option[String],
      disability: Option[(String, Option[String])], // qualifier, value (null value covered)
      note: Option[String], priorAuth: Option[String],
      extraRef: Option[(String, String)], // 2nd claim-level REF; first REF wins (hcc:116)
      referring: Option[(PartySpec, Option[(String, String)])],
      rendering: Option[(PartySpec, Option[(String, String)], Option[String])],
      facilityParty: Option[PartySpec],
      others: Seq[OtherSpec],
      services: Seq[SvcSpec])

  final case class DocSpec(
      docId: String,
      billing: PartySpec, taxQual: Option[String], taxId: Option[String],
      extraBillingRef: Option[(String, String)], phone: Option[String],
      perEmFirst: Boolean, // a non-TE PER precedes any TE one (hcc:43 detect)
      subscriberIsPatient: Boolean,
      filing: String, groupName: Option[String], groupNumber: Option[String],
      insured: PartySpec, payer: PartySpec,
      patientRel: Option[String], patient: Option[PartySpec],
      claims: Seq[Claim2300Spec])

  // ---- generation --------------------------------------------------------

  val NumDocs = 200

  def corpus: Seq[DocSpec] = (0 until NumDocs).map(genDoc)

  private val lasts = Vector("SMITH", "JONES", "GARCIA", "CHEN", "MILLER", "DAVIS", "WILSON", "LOPEZ")
  private val firsts = Vector("JOHN", "MARY", "WEI", "ANA", "PAUL", "SARA", "OMAR", "KIM")
  private val orgs = Vector("ACME MEDICAL GROUP", "CITY CLINIC", "VALLEY HEALTH", "LAKESIDE LABS")
  private val streets = Vector("12 OAK ST", "400 PINE AVE", "77 ELM RD", "9 MAIN ST", "250 BIRCH LN")
  private val cities = Vector("SPRINGFIELD", "RIVERTON", "LAKEWOOD", "FAIRVIEW", "GREENVILLE")
  private val states = Vector("CA", "TX", "NY", "WA", "IL")
  private val filings = Vector("MA", "MB", "MC", "CH", "VA", "CI", "BL")
  private val rels = Vector("01", "19", "G8", "21")

  private def zip(r: Random): String =
    if (r.nextBoolean()) f"${10000 + r.nextInt(89999)}%05d"
    else f"${10000 + r.nextInt(89999)}%05d${r.nextInt(9999)}%04d"

  private def date(r: Random): String =
    f"${1990 + r.nextInt(35)}%04d${1 + r.nextInt(12)}%02d${1 + r.nextInt(28)}%02d"

  private def amount(r: Random): String = f"${10 + r.nextInt(4990)}%d.${r.nextInt(100)}%02d"

  private def opt[A](r: Random, p: Double)(v: => A): Option[A] =
    if (r.nextDouble() < p) Some(v) else None

  private def party(r: Random, forcePerson: Option[Boolean] = None,
      idQual: String = "XX", withDmg: Boolean = false): PartySpec = {
    val person = forcePerson.getOrElse(r.nextBoolean())
    PartySpec(
      person = person,
      last = if (person) lasts(r.nextInt(lasts.size)) else orgs(r.nextInt(orgs.size)),
      first = if (person) firsts(r.nextInt(firsts.size)) else null,
      middle = if (person) opt(r, 0.5)(firsts(r.nextInt(firsts.size))) else None,
      idQual = idQual,
      id = opt(r, 0.85)(f"1${r.nextInt(999999999)}%09d"),
      address = opt(r, 0.9)(streets(r.nextInt(streets.size))),
      n4 = opt(r, 0.9)((cities(r.nextInt(cities.size)), states(r.nextInt(states.size)), zip(r))),
      dmg = if (withDmg) opt(r, 0.85)((date(r), if (r.nextBoolean()) "M" else "F")) else None)
  }

  private def diagCode(r: Random): String = r.nextInt(5) match {
    case 0 => f"E${800 + r.nextInt(200)}%03d${r.nextInt(10)}%d" // E850.9 shape
    case 1 => f"V${r.nextInt(100)}%02d${r.nextInt(100)}%02d"    // V54.31 shape
    case 2 => f"${100 + r.nextInt(900)}%03d${r.nextInt(100)}%02d" // 123.45 shape
    case 3 => f"${100 + r.nextInt(900)}%03d${r.nextInt(10)}%d"  // 4-digit
    case _ => f"${100 + r.nextInt(900)}%03d"                    // short (formats to "123.")
  }

  private def service(r: Random, idx: Int): SvcSpec = {
    // legacy fallback branch selector: 0=lineRef 1=linePrv 2=claim ref 3=claim prv/none
    val branch = r.nextInt(4)
    SvcSpec(
      date = date(r),
      proc = f"99${200 + r.nextInt(100)}%03d",
      mods = Seq.fill(r.nextInt(3))(f"${25 + r.nextInt(70)}%02d"),
      pointers = (1 to 4).take(r.nextInt(5)).map(_.toString),
      charge = opt(r, 0.95)(amount(r)),
      units = opt(r, 0.9)((1 + r.nextInt(10)).toString),
      facility = opt(r, 0.5)(f"${11 + r.nextInt(80)}%02d"),
      desc = opt(r, 0.4)(s"SERVICE DESC ${idx + 1}"),
      ps1 = opt(r, 0.3)(amount(r)),
      svd = opt(r, 0.6)(amount(r)),
      has2420a = branch <= 1 || r.nextBoolean(),
      lineNpi = opt(r, 0.5)(f"2${r.nextInt(999999999)}%09d"),
      lineRef =
        if (branch == 0) Some(("G2", f"LR${r.nextInt(99999)}%05d"))
        else if (r.nextDouble() < 0.1) Some(("G2", "")) // qualifier-only REF
        else None,
      linePrv = if (branch == 1) Some(f"LP${r.nextInt(99999)}%05d") else None)
  }

  private def claim2300(r: Random, docIdx: Int, claimIdx: Int): Claim2300Spec = {
    val nDiag = r.nextInt(5)
    Claim2300Spec(
      acct = f"ACCT${docIdx}%03d${claimIdx}%d",
      amount = amount(r),
      facility = opt(r, 0.7)(f"${11 + r.nextInt(80)}%02d"),
      provSig = if (r.nextBoolean()) "Y" else "N",
      acceptAssign = if (r.nextBoolean()) "A" else "C",
      rc1 = opt(r, 0.5)(Vector("OA", "EM", "AA", "XX")(r.nextInt(4))),
      rc2 = opt(r, 0.3)(Vector("OA", "EM", "AA")(r.nextInt(3))),
      clmState = opt(r, 0.6)(states(r.nextInt(states.size))),
      diag = (0 until 4).map(i => if (i < nDiag) Some(diagCode(r)) else None),
      accident = opt(r, 0.4)(date(r)),
      admit = opt(r, 0.4)(date(r)),
      discharge = opt(r, 0.4)(date(r)),
      disability = r.nextInt(5) match {
        case 0 => Some(("314", Some(s"${date(r)}-${date(r)}")))
        case 1 => Some(("360", Some(date(r))))
        case 2 => Some(("361", Some(date(r))))
        case 3 => Some(("314", None)) // present but valueless (hcc:122 guard)
        case _ => None
      },
      note = opt(r, 0.4)(s"NOTE FOR CLAIM ${docIdx}-${claimIdx}"),
      priorAuth = opt(r, 0.5)(f"PA${r.nextInt(999999)}%06d"),
      extraRef = opt(r, 0.3)(("9F", f"XR${r.nextInt(9999)}%04d")),
      referring = opt(r, 0.6)((party(r, forcePerson = Some(true)),
        opt(r, 0.6)(("1G", f"RP${r.nextInt(99999)}%05d")))),
      rendering = opt(r, 0.7)((party(r, forcePerson = Some(r.nextBoolean())),
        opt(r, 0.5)(("0B", if (r.nextDouble() < 0.15) "" else f"CR${r.nextInt(99999)}%05d")),
        opt(r, 0.6)(f"CP${r.nextInt(99999)}%05d"))),
      facilityParty = opt(r, 0.5)(party(r, forcePerson = Some(false))),
      others = Seq.fill(r.nextInt(3))(OtherSpec(
        opt(r, 0.8)(f"OG${r.nextInt(99999)}%05d"),
        opt(r, 0.7)(s"OTHER PLAN ${r.nextInt(100)}"),
        party(r, forcePerson = Some(true)))),
      services = Seq.fill(r.nextInt(4))(service(r, r.nextInt(100))))
  }

  def genDoc(idx: Int): DocSpec = {
    val r = new Random(7919L * idx + 13)
    DocSpec(
      docId = f"D${idx}%04d",
      billing = party(r),
      taxQual = opt(r, 0.9)(if (r.nextBoolean()) "SY" else "EI"),
      taxId = Some(f"9${r.nextInt(99999999)}%08d"),
      extraBillingRef = opt(r, 0.3)(("0B", f"XB${r.nextInt(9999)}%04d")),
      phone = opt(r, 0.6)(f"555${r.nextInt(9999999)}%07d"),
      perEmFirst = r.nextDouble() < 0.3,
      subscriberIsPatient = r.nextBoolean(),
      filing = filings(r.nextInt(filings.size)),
      groupName = opt(r, 0.7)(s"PLAN ${r.nextInt(1000)}"),
      groupNumber = opt(r, 0.8)(f"GRP${r.nextInt(99999)}%05d"),
      insured = party(r, forcePerson = Some(true), idQual = "MI", withDmg = true),
      payer = party(r, forcePerson = Some(false)),
      patientRel = Some(rels(r.nextInt(rels.size))),
      patient = Some(party(r, forcePerson = Some(true), withDmg = true)),
      claims = (0 until (1 + r.nextInt(3))).map(i => claim2300(r, idx, i)))
  }

  // ---- X12 rendering -----------------------------------------------------

  private def seg(parts: String*): String = {
    // trim trailing empty elements like real emitters do
    val els = parts.map(p => if (p == null) "" else p)
    val trimmed = els.reverse.dropWhile(_.isEmpty).reverse
    trimmed.mkString("*") + "~"
  }

  private def renderNm1(code: String, p: PartySpec): String =
    if (p.person)
      seg("NM1", code, "1", p.last, p.first, p.middle.getOrElse(""), "", "",
        p.id.map(_ => p.idQual).getOrElse(""), p.id.getOrElse(""))
    else
      seg("NM1", code, "2", p.last, "", "", "", "",
        p.id.map(_ => p.idQual).getOrElse(""), p.id.getOrElse(""))

  /** Full 2010-style loop (NM1+N3+N4+DMG). Only used where the reference
    * reads the address block; provider loops (2310A/B, 2420A, 2330A) render
    * NM1-only since only the NM1/REF/PRV elements are consumed there.
    */
  private def renderParty(code: String, p: PartySpec): Seq[String] =
    Seq(renderNm1(code, p)) ++
      p.address.map(a => seg("N3", a)) ++
      p.n4.map { case (c, s, z) => seg("N4", c, s, z) } ++
      p.dmg.map { case (d, g) => seg("DMG", "D8", d, g) }

  def render(d: DocSpec): String = {
    val b = Seq.newBuilder[String]
    b += seg("ST", "837", d.docId)
    b += seg("BHT", "0019", "00", d.docId)
    b += seg("HL", "1", "", "20", "1")
    b ++= renderParty("85", d.billing)
    d.taxQual.foreach(q => b += seg("REF", q, d.taxId.getOrElse("")))
    d.extraBillingRef.foreach { case (q, v) => b += seg("REF", q, v) }
    if (d.perEmFirst) b += seg("PER", "IC", "BILLING CONTACT", "EM", "bill@example.test")
    d.phone.foreach(ph => b += seg("PER", "IC", "BILLING CONTACT", "TE", ph))
    b += seg("HL", "2", "1", "22", if (d.subscriberIsPatient) "0" else "1")
    b += seg("SBR", "P", "18", d.groupNumber.getOrElse(""), d.groupName.getOrElse(""),
      "", "", "", "", d.filing)
    b ++= renderParty("IL", d.insured)
    b ++= renderParty("PR", d.payer)
    if (!d.subscriberIsPatient) {
      b += seg("HL", "3", "2", "23", "0")
      b += seg("PAT", d.patientRel.getOrElse(""))
      d.patient.foreach(p => b ++= renderParty("QC", p))
    }
    d.claims.foreach { c =>
      val causes = Seq(c.rc1.getOrElse(""), c.rc2.getOrElse(""), "", c.clmState.getOrElse(""))
        .mkString(":")
      b += seg("CLM", c.acct, c.amount, "", "",
        c.facility.map(f => s"$f:B:1").getOrElse(""), c.provSig, c.acceptAssign,
        "Y", "Y", "", causes)
      c.accident.foreach(v => b += seg("DTP", "439", "D8", v))
      c.admit.foreach(v => b += seg("DTP", "435", "D8", v))
      c.discharge.foreach(v => b += seg("DTP", "096", "D8", v))
      c.disability.foreach { case (q, v) =>
        b += seg("DTP", q, if (q == "314") "RD8" else "D8", v.getOrElse(""))
      }
      if (c.diag.exists(_.isDefined)) {
        val quals = Seq("BK", "BF", "BF", "BF")
        b += seg("HI" +: c.diag.zip(quals).map {
          case (Some(code), q) => s"$q:$code"
          case (None, _) => ""
        }: _*)
      }
      c.note.foreach(n => b += seg("NTE", "ADD", n))
      c.priorAuth.foreach(pa => b += seg("REF", "G1", pa))
      c.extraRef.foreach { case (q, v) => b += seg("REF", q, v) }
      c.referring.foreach { case (p, ref) =>
        b += renderNm1("DN", p)
        ref.foreach { case (q, v) => b += seg("REF", q, v) }
      }
      c.rendering.foreach { case (p, ref, prv) =>
        b += renderNm1("82", p)
        ref.foreach { case (q, v) => b += seg("REF", q, v) }
        prv.foreach(v => b += seg("PRV", "PE", "PXC", v))
      }
      c.facilityParty.foreach(p => b ++= renderParty("77", p))
      c.others.foreach { o =>
        b += seg("SBR", "S", "01", o.groupNumber.getOrElse(""), o.groupName.getOrElse(""),
          "", "", "", "", "CI")
        b += renderNm1("IL", o.insured)
      }
      c.services.zipWithIndex.foreach { case (s, i) =>
        b += seg("LX", (i + 1).toString)
        val comp1 = (Seq("HC", s.proc) ++ s.mods.padTo(4, "") ++ Seq(s.desc.getOrElse("")))
          .mkString(":")
        val comp7 = s.pointers.padTo(4, "").mkString(":")
        b += seg("SV1", comp1, s.charge.getOrElse(""), "UN", s.units.getOrElse(""),
          s.facility.getOrElse(""), "", comp7)
        b += seg("DTP", "472", "D8", s.date)
        s.ps1.foreach(v => b += seg("PS1", "1", v))
        if (s.has2420a || s.lineNpi.isDefined || s.lineRef.isDefined || s.linePrv.isDefined) {
          b += seg("NM1", "82", "1", "SVCPROV", "LINE", "", "", "",
            s.lineNpi.map(_ => "XX").getOrElse(""), s.lineNpi.getOrElse(""))
          s.lineRef.foreach { case (q, v) => b += seg("REF", q, v) }
          s.linePrv.foreach(v => b += seg("PRV", "PE", "PXC", v))
        }
        s.svd.foreach(v => b += seg("SVD", "PAYER1", v))
      }
    }
    b += seg("SE", "0", d.docId)
    b.result().mkString("\n")
  }

  // ---- fixture materialization ------------------------------------------

  val FixtureRoot = "/root/repo/fixtures"
  val EdiDir = s"$FixtureRoot/edi"
  val ExpectedDir = s"$FixtureRoot/expected"

  def writeEdi(): Unit = {
    val dir = Paths.get(EdiDir)
    Files.createDirectories(dir)
    corpus.foreach { d =>
      Files.writeString(dir.resolve(s"${d.docId}.txt"), render(d))
    }
  }
}
