package graft.edi

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala 837P parser: one raw X12 document string -> ClaimDoc.
  *
  * This is the engine's replacement for the reference's external hippo gem
  * call (`lib/hippo_claim_crossover.rb:11`). It is deliberately plain Scala
  * (no Catalyst): parsing is embarrassingly parallel per document, so the
  * engine runs it inside `mapPartitions` over a `Dataset[String]` — a narrow
  * stage with no shuffle (SURVEY.md §3.4). At 100 TB the parallelism is the
  * number of input splits; there is no coordination between documents.
  *
  * X12 conventions: `~` segment terminator, `*` element separator, `:`
  * component separator. Loop structure is resolved by a sequential state
  * machine keyed on (segment id, qualifier, current loop context) — the same
  * information Hippo's grammar uses, without the DSL.
  *
  * Null semantics: absent segment => null field; absent element => null
  * (never ""), so downstream `coalesce`/`when` chains behave like the
  * reference's nil guards (SURVEY.md §7 step 3 "top bug farm").
  */
object Edi837Parser {

  /** One raw segment: id + elements (1-based access like X12 refs). */
  private final case class Seg(id: String, el: Array[String]) {
    /** Element n (1-based); null when absent or empty. */
    def e(n: Int): String =
      if (n < el.length && el(n).nonEmpty) el(n) else null
    /** Component c (1-based) of element n. */
    def c(n: Int, comp: Int): String = {
      val v = e(n)
      if (v == null) null
      else {
        val parts = v.split(':')
        if (comp - 1 < parts.length && parts(comp - 1).nonEmpty) parts(comp - 1) else null
      }
    }
  }

  /** Split a raw X12 interchange into per-transaction ST..SE documents, so
    * one file can carry N claims documents (real claims feeds ship
    * ISA/GS-enveloped interchanges with many transactions — a 100 TB feed
    * is never one-transaction-per-file). Envelope segments (ISA, GS, GE,
    * IEA) carry no mapped data and are dropped; a file with no ST at all
    * passes through unchanged so bare-transaction fixtures keep working.
    * Row-local (string walk, no allocation beyond the per-transaction
    * buffers) — runs inside the same narrow mapPartitions stage as `parse`.
    */
  def splitInterchange(raw: String): Seq[String] = {
    val segs = raw.split('~').iterator.map(_.trim).filter(_.nonEmpty).toArray
    val out = ArrayBuffer[String]()
    var cur: ArrayBuffer[String] = null
    var sawSt = false
    segs.foreach { seg =>
      seg.takeWhile(_ != '*') match {
        case "ST" =>
          if (cur != null) out += cur.mkString("", "~", "~") // unterminated ST..
          sawSt = true
          cur = ArrayBuffer(seg)
        case "SE" =>
          if (cur != null) { cur += seg; out += cur.mkString("", "~", "~"); cur = null }
        case "ISA" | "GS" | "GE" | "IEA" => () // envelope only
        case _ => if (cur != null) cur += seg
      }
    }
    if (cur != null) out += cur.mkString("", "~", "~")
    if (!sawSt) Seq(raw) else out.toSeq
  }

  private def tokenize(doc: String): Seq[Seg] =
    doc.split('~').iterator
      .map(_.trim)
      .filter(_.nonEmpty)
      .map(s => s.split('*'))
      .filter(_.nonEmpty) // "***" splits to an empty array — not a segment
      .map(el => Seg(el(0), el))
      .toSeq

  // ---- mutable builders (frozen to case classes at the end) --------------

  private final class PartyB {
    var nm1: Nm1 = _
    var address: String = _
    var city: String = _; var state: String = _; var zip: String = _
    val refs = ArrayBuffer[RefSeg]()
    var phone: String = _
    var dmg: Dmg = _
    def freeze: Party = Party(nm1, address, city, state, zip, refs.toSeq, phone, dmg)
  }

  private final class ServiceB {
    var serviceDate: String = _
    var sv1: Sv1 = _
    var ps1Amount: String = _
    var nm1: Nm1 = _; var ref: RefSeg = _; var prvId: String = _
    var svdAmount: String = _
    def freeze: L2400 = L2400(serviceDate, sv1, ps1Amount,
      if (nm1 == null && ref == null && prvId == null) null else L2420A(nm1, ref, prvId),
      svdAmount)
  }

  private final class ClaimB {
    var clm: Clm = _
    var diag: Seq[String] = Seq(null, null, null, null)
    val dtps = ArrayBuffer[Dtp]()
    var note: String = _
    var priorAuth: String = _
    var refProvNm1: Nm1 = _; var refProvRef: RefSeg = _
    var rendNm1: Nm1 = _; var rendRef: RefSeg = _; var rendPrvId: String = _
    var facility: PartyB = _
    val l2320s = ArrayBuffer[L2320]()
    val services = ArrayBuffer[ServiceB]()
    def freeze: L2300 = L2300(
      clm, diag, dtps.toSeq, note, priorAuth,
      if (refProvNm1 == null) null else L2310A(refProvNm1, refProvRef),
      if (rendNm1 == null) null else L2310B(rendNm1, rendRef, rendPrvId),
      if (facility == null) null else facility.freeze,
      l2320s.toSeq, services.map(_.freeze).toSeq)
  }

  /** Loop contexts the state machine can sit in. */
  private object Ctx extends Enumeration {
    val Doc, Billing, Subscriber, Insured, Payer, Patient, Claim,
        RefProv, RendProv, Facility, OtherSub, OtherIns, Service, SvcProv = Value
  }

  def parse(doc: String): ClaimDoc = {
    var docId: String = null
    val billing = new PartyB
    var subscriberChildCode: String = null
    var sbr: Sbr = null
    var insured: PartyB = null
    var payer: PartyB = null
    var patientRel: String = null
    var patient: PartyB = null
    val claims = ArrayBuffer[ClaimB]()

    var ctx = Ctx.Doc
    var curParty: PartyB = null       // which PartyB N3/N4/DMG/PER attach to
    var cur2320OtherIns: Nm1 = null   // pending 2330A NM1 for last 2320

    def claim: ClaimB = claims.last
    def svc: ServiceB = claim.services.last
    def inClaim: Boolean = claims.nonEmpty
    def inSvc: Boolean = claims.nonEmpty && claims.last.services.nonEmpty

    def nm1Of(s: Seg) = Nm1(s.e(1), s.e(2), s.e(3), s.e(4), s.e(5), s.e(8), s.e(9))

    tokenize(doc).foreach { s =>
      s.id match {
        case "ST" => docId = s.e(2)
        case "HL" =>
          s.e(3) match {
            case "20" => ctx = Ctx.Doc // billing HL; 2010AA starts at NM1*85
            case "22" => ctx = Ctx.Subscriber; subscriberChildCode = s.e(4)
            case "23" => ctx = Ctx.Patient // patient HL (2000C)
            case _    => ()
          }
        case "PAT" => patientRel = s.e(1)
        case "SBR" =>
          if (claims.isEmpty) sbr = Sbr(s.e(1), s.e(2), s.e(3), s.e(4), s.e(9))
          else { // 2320 loop inside the current 2300
            flush2320()
            claim.l2320s += L2320(Sbr(s.e(1), s.e(2), s.e(3), s.e(4), s.e(9)), null)
            ctx = Ctx.OtherSub
          }
        case "NM1" =>
          val n = nm1Of(s)
          n.entityId match {
            case "85" => billing.nm1 = n; curParty = billing; ctx = Ctx.Billing
            case "IL" =>
              if (ctx == Ctx.OtherSub) { // 2330A other insured
                cur2320OtherIns = n; ctx = Ctx.OtherIns
              } else {
                insured = new PartyB; insured.nm1 = n; curParty = insured; ctx = Ctx.Insured
              }
            case "PR" => payer = new PartyB; payer.nm1 = n; curParty = payer; ctx = Ctx.Payer
            case "QC" => patient = new PartyB; patient.nm1 = n; curParty = patient; ctx = Ctx.Patient
            case "DN" => if (inClaim) { claim.refProvNm1 = n; ctx = Ctx.RefProv }
            case "82" =>
              if ((ctx == Ctx.Service || ctx == Ctx.SvcProv) && inSvc) { svc.nm1 = n; ctx = Ctx.SvcProv }
              else if (inClaim) { claim.rendNm1 = n; ctx = Ctx.RendProv }
            case "77" =>
              if (inClaim) {
                claim.facility = new PartyB; claim.facility.nm1 = n
                curParty = claim.facility; ctx = Ctx.Facility
              }
            case _ => ()
          }
        case "N3" => if (curParty != null) curParty.address = s.e(1)
        case "N4" =>
          if (curParty != null) { curParty.city = s.e(1); curParty.state = s.e(2); curParty.zip = s.e(3) }
        case "DMG" => if (curParty != null) curParty.dmg = Dmg(s.e(2), s.e(3))
        case "PER" =>
          // first TE entry wins, mirroring detect (hcc:43)
          if (curParty != null && curParty.phone == null && s.e(3) == "TE") curParty.phone = s.e(4)
        case "REF" =>
          val r = RefSeg(s.e(1), s.e(2))
          ctx match {
            case Ctx.Billing  => billing.refs += r
            case Ctx.Claim    => if (inClaim && claim.priorAuth == null) claim.priorAuth = r.id // hcc:116 first REF
            case Ctx.RefProv  => if (inClaim && claim.refProvRef == null) claim.refProvRef = r
            case Ctx.RendProv => if (inClaim && claim.rendRef == null) claim.rendRef = r
            // a 2420A may carry REF/PRV without an NM1 (hcc:246-251 reads
            // them independently), so Service context routes to the line too
            case Ctx.Service | Ctx.SvcProv => if (inSvc && svc.ref == null) svc.ref = r
            case _            => ()
          }
        case "PRV" =>
          ctx match {
            case Ctx.RendProv => if (inClaim) claim.rendPrvId = s.e(3)
            case Ctx.Service | Ctx.SvcProv => if (inSvc) svc.prvId = s.e(3)
            case _            => ()
          }
        case "CLM" =>
          flush2320()
          val b = new ClaimB
          b.clm = Clm(s.e(1), s.e(2), s.c(5, 1), s.e(6), s.e(7), s.c(11, 1), s.c(11, 2), s.c(11, 4))
          claims += b
          curParty = null
          ctx = Ctx.Claim
        case "HI" =>
          if (inClaim) claim.diag = (1 to 4).map(i => s.c(i, 2))
        case "DTP" =>
          if (ctx == Ctx.Service || ctx == Ctx.SvcProv) {
            if (inSvc && s.e(1) == "472" && svc.serviceDate == null) svc.serviceDate = s.e(3)
          } else if (claims.nonEmpty) claim.dtps += Dtp(s.e(1), s.e(2), s.e(3))
        case "NTE" => if (claims.nonEmpty && claim.note == null) claim.note = s.e(2)
        case "LX" =>
          if (inClaim) {
            flush2320()
            claim.services += new ServiceB
            ctx = Ctx.Service
          }
        case "SV1" =>
          if (inSvc) svc.sv1 = Sv1(
            s.c(1, 2), s.c(1, 3), s.c(1, 4), s.c(1, 5), s.c(1, 6), s.c(1, 7),
            s.e(2), s.e(4), s.e(5),
            s.c(7, 1), s.c(7, 2), s.c(7, 3), s.c(7, 4))
        case "PS1" => if (inSvc) svc.ps1Amount = s.e(2)
        case "SVD" => if (inSvc) svc.svdAmount = s.e(2)
        case _ => () // BHT/SE/other envelope segments carry no mapped data
      }

      def flush2320(): Unit =
        if (cur2320OtherIns != null && claims.nonEmpty && claim.l2320s.nonEmpty) {
          val last = claim.l2320s.remove(claim.l2320s.length - 1)
          claim.l2320s += last.copy(otherInsured = cur2320OtherIns)
          cur2320OtherIns = null
        }
    }
    // attach a trailing 2330A that wasn't flushed by a following segment
    if (cur2320OtherIns != null && claims.nonEmpty && claims.last.l2320s.nonEmpty) {
      val c = claims.last
      val last = c.l2320s.remove(c.l2320s.length - 1)
      c.l2320s += last.copy(otherInsured = cur2320OtherIns)
    }

    ClaimDoc(docId, billing.freeze, subscriberChildCode, sbr,
      if (insured == null) null else insured.freeze,
      if (payer == null) null else payer.freeze,
      patientRel,
      if (patient == null) null else patient.freeze,
      claims.map(_.freeze).toSeq)
  }
}
