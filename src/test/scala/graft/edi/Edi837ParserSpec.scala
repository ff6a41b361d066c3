package graft.edi

import org.scalatest.funsuite.AnyFunSuite

/** Parser unit coverage over a handcrafted document exercising the loop
  * hierarchy, qualifier routing, and absent-segment null semantics
  * (SURVEY.md §7 step 3's "top bug farm").
  */
class Edi837ParserSpec extends AnyFunSuite {

  private val doc =
    """ST*837*D9999~
      |BHT*0019*00*D9999~
      |HL*1**20*1~
      |NM1*85*2*ACME MEDICAL*****XX*1234567890~
      |N3*12 OAK ST~
      |N4*SPRINGFIELD*CA*941041234~
      |REF*0B*OTHERREF~
      |REF*EI*991234567~
      |PER*IC*BILLING*TE*5551234567~
      |HL*2*1*22*1~
      |SBR*P*18*GRP001*BLUE PLAN*****MB~
      |NM1*IL*1*SMITH*JOHN*Q***MI*MEM001~
      |N3*400 PINE AVE~
      |N4*RIVERTON*TX*75001~
      |DMG*D8*19800215*M~
      |NM1*PR*2*BIG PAYER~
      |N3*1 PAYER WAY~
      |N4*LAKEWOOD*NY*10001~
      |HL*3*2*23*0~
      |PAT*19~
      |NM1*QC*1*SMITH*JIMMY~
      |N3*400 PINE AVE~
      |N4*RIVERTON*TX*75001~
      |DMG*D8*20100501*F~
      |CLM*ACCT1*500.00***11:B:1*Y*A*Y*Y**OA:EM::CA~
      |DTP*439*D8*20240101~
      |DTP*314*RD8*20240102-20240110~
      |HI*BK:E8509*BF:V5431**BF:78900~
      |NTE*ADD*A NOTE~
      |REF*G1*PA123~
      |NM1*DN*1*REFER*RON~
      |REF*1G*RP001~
      |NM1*82*1*REND*RAY~
      |PRV*PE*PXC*CP001~
      |NM1*77*2*SITE ORG~
      |N3*9 MAIN ST~
      |N4*FAIRVIEW*IL*62001~
      |SBR*S*01*OG1*OTHER PLAN*****CI~
      |NM1*IL*1*OTHER*OLGA~
      |LX*1~
      |SV1*HC:99213:25:59:::FIRST LINE*150.75*UN*2*12**1:2::~
      |DTP*472*D8*20240105~
      |PS1*1*40.25~
      |NM1*82*1*SVCPROV*LINE****XX*2000000001~
      |REF*G2*LR001~
      |SVD*PAYER1*120.50~
      |LX*2~
      |SV1*HC:99214*60.00*UN*1***3:::~
      |DTP*472*D8*20240106~
      |SE*0*D9999~""".stripMargin

  private lazy val parsed = Edi837Parser.parse(doc)

  test("doc id and hierarchy flags") {
    assert(parsed.docId == "D9999")
    assert(parsed.subscriberChildCode == "1") // patient is NOT subscriber
    assert(parsed.patientRel == "19")
  }

  test("billing provider with qualifier-discriminated REFs and PER-TE") {
    assert(parsed.billing.nm1.last == "ACME MEDICAL")
    assert(parsed.billing.nm1.id == "1234567890")
    assert(parsed.billing.zip == "941041234")
    assert(parsed.billing.refs.map(_.qual) == Seq("0B", "EI"))
    assert(parsed.billing.phone == "5551234567")
  }

  test("subscriber SBR vs 2320 SBR routing") {
    assert(parsed.sbr.filingCode == "MB")
    assert(parsed.sbr.groupNumber == "GRP001")
    val c = parsed.claims.head
    assert(c.l2320s.size == 1)
    assert(c.l2320s.head.sbr.groupNumber == "OG1")
    assert(c.l2320s.head.otherInsured.last == "OTHER")
  }

  test("patient loop captured separately from insured") {
    assert(parsed.insured.nm1.first == "JOHN")
    assert(parsed.insured.dmg.gender == "M")
    assert(parsed.patient.nm1.first == "JIMMY")
    assert(parsed.patient.dmg.gender == "F")
  }

  test("claim header, composites, and qualifier-routed DTPs") {
    val c = parsed.claims.head
    assert(c.clm.accountNumber == "ACCT1")
    assert(c.clm.facilityCode == "11")
    assert(c.clm.relatedCause1 == "OA")
    assert(c.clm.relatedCause2 == "EM")
    assert(c.clm.state == "CA")
    assert(c.diag == Seq("E8509", "V5431", null, "78900"))
    assert(c.dtps.map(_.qual) == Seq("439", "314"))
    assert(c.note == "A NOTE")
    assert(c.priorAuth == "PA123")
  }

  test("2310 provider loops") {
    val c = parsed.claims.head
    assert(c.l2310a.nm1.first == "RON")
    assert(c.l2310a.ref.id == "RP001")
    assert(c.l2310b.nm1.first == "RAY")
    assert(c.l2310b.ref == null)
    assert(c.l2310b.prvId == "CP001")
    assert(c.l2310c.nm1.last == "SITE ORG")
    assert(c.l2310c.zip == "62001")
  }

  test("service lines with composite SV1 and 2420A/2430") {
    val c = parsed.claims.head
    assert(c.services.size == 2)
    val s1 = c.services.head
    assert(s1.sv1.procCode == "99213")
    assert(s1.sv1.m1 == "25" && s1.sv1.m2 == "59" && s1.sv1.m3 == null)
    assert(s1.sv1.desc == "FIRST LINE")
    assert(s1.sv1.amount == "150.75")
    assert(s1.sv1.facilityCode == "12")
    assert(s1.sv1.p1 == "1" && s1.sv1.p2 == "2" && s1.sv1.p3 == null)
    assert(s1.serviceDate == "20240105")
    assert(s1.ps1Amount == "40.25")
    assert(s1.l2420a.nm1.id == "2000000001")
    assert(s1.l2420a.ref.id == "LR001")
    assert(s1.svdAmount == "120.50")
    val s2 = c.services(1)
    assert(s2.sv1.procCode == "99214")
    assert(s2.sv1.desc == null)
    assert(s2.ps1Amount == null)
    assert(s2.l2420a == null)
    assert(s2.svdAmount == null)
  }

  test("degenerate inputs parse without throwing") {
    val empty = Edi837Parser.parse("")
    assert(empty.docId == null && empty.claims.isEmpty)
    val junk = Edi837Parser.parse("NOT*AN*EDI~GARBAGE~~~***~")
    assert(junk.claims.isEmpty)
    // segments for loops that never opened are ignored, not attached
    val orphan = Edi837Parser.parse("ST*837*DX~SV1*HC:1*5~PS1*1*2~SE*0*DX~")
    assert(orphan.docId == "DX" && orphan.claims.isEmpty)
  }

  test("splitInterchange yields one document per ST..SE transaction") {
    import graft.fixtures.ClaimFixtures
    val docs = ClaimFixtures.corpus.take(3).map(ClaimFixtures.render)
    // wrap three transactions in a full ISA/GS envelope, the shape a real
    // claims feed ships (one file, many transactions)
    val interchange =
      "ISA*00*          *00*          *ZZ*SENDER         *ZZ*RECEIVER       " +
        "*260101*0101*^*00501*000000001*0*P*:~" +
        "GS*HC*SENDER*RECEIVER*20260101*0101*1*X*005010X222A1~" +
        docs.mkString("") +
        "GE*3*1~IEA*1*000000001~"
    val split = Edi837Parser.splitInterchange(interchange)
    assert(split.length == 3)
    val parsed = split.map(Edi837Parser.parse)
    val direct = docs.map(Edi837Parser.parse)
    assert(parsed == direct) // envelope handling changes nothing per-doc
  }

  test("splitInterchange passes a bare transaction through unchanged") {
    assert(Edi837Parser.splitInterchange(doc) == Seq(doc) ||
      Edi837Parser.parse(Edi837Parser.splitInterchange(doc).head) == Edi837Parser.parse(doc))
    assert(Edi837Parser.splitInterchange("no x12 here") == Seq("no x12 here"))
  }

  test("malformed input never throws: garbage yields zero claims, valid transactions survive") {
    // pure garbage, truncated segments, stray separators, empty string:
    // the state machine must produce a claim-less doc, not an exception —
    // a 100 TB feed WILL contain corrupt files and one bad row must not
    // kill the ingest job
    val garbage = Seq("", "~~~", "***", "not x12 at all",
      "ST*837~CLM~SE", "NM1*85~CLM*", "ST*837*X~CLM*A~",
      "ISA*00*~GS*HC~ST*837*T1~SE*0*T1~GE~IEA~")
    garbage.foreach { g =>
      val d = Edi837Parser.parse(g) // must not throw
      assert(d != null)
    }
    // a half-corrupt interchange: the valid transaction still parses fully
    val parsed = Edi837Parser.splitInterchange(
      "ISA*00~GS*HC~ST*837*BAD~@@@corrupt@@~SE*0*BAD~" + doc + "GE~IEA~")
      .map(Edi837Parser.parse)
    assert(parsed.exists(_.claims.nonEmpty), "the valid transaction must still yield claims")
  }

  test("absent segments stay null (auto-vivification analog)") {
    val minimal = Edi837Parser.parse(
      "ST*837*D0~HL*1**20*1~NM1*85*2*ORG~HL*2*1*22*0~SBR*P*18*******MC~" +
        "NM1*IL*1*DOE*JANE~NM1*PR*2*P~CLM*A*1.00~SE*0*D0~")
    assert(minimal.subscriberChildCode == "0")
    assert(minimal.billing.zip == null)
    assert(minimal.billing.phone == null)
    assert(minimal.insured.dmg == null)
    val c = minimal.claims.head
    assert(c.clm.facilityCode == null)
    assert(c.diag == Seq(null, null, null, null))
    assert(c.l2310a == null && c.l2310b == null && c.l2310c == null)
    assert(c.l2320s.isEmpty && c.services.isEmpty)
  }
}
