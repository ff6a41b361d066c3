package graft.edi

/** Nested document model for a parsed 837P claim — the Spark analog of the
  * reference's Hippo loop tree (`lib/hippo_claim_crossover.rb:11`), shaped as
  * case classes so `Dataset[ClaimDoc]` gets a compile-time Encoder.
  *
  * Loops are `Seq` (arrays of structs), 0..1 segments are nullable fields.
  * Absent segments are represented as nulls, which propagate through the
  * column-expression mapping exactly like Hippo's auto-vivified blank
  * segments nil-propagate in the reference (SURVEY.md §1.1).
  *
  * All element values are raw strings (X12 is untyped text); casts happen in
  * the mapping layer (SURVEY.md §1.2).
  */
final case class Nm1(
    entityId: String,      // NM101: 85 billing, IL insured, PR payer, QC patient, DN referring, 82 rendering, 77 facility
    entityType: String,    // NM102: '1' person, '2' org   (hcc:222)
    last: String,          // NM103 NameLastOrOrganizationName
    first: String,         // NM104
    middle: String,        // NM105
    idQual: String,        // NM108 (XX=NPI, MI=member id)
    id: String)            // NM109 IdentificationCode

final case class RefSeg(qual: String, id: String)  // REF01, REF02

final case class Dmg(date: String, gender: String) // DMG02 CCYYMMDD, DMG03 M/F

final case class Sbr(
    payerResp: String,     // SBR01
    relCode: String,       // SBR02
    groupNumber: String,   // SBR03 ReferenceIdentification (hcc:87, hcc:110)
    groupName: String,     // SBR04 Name (hcc:86, hcc:111)
    filingCode: String)    // SBR09 ClaimFilingIndicatorCode (hcc:60)

final case class Dtp(qual: String, fmt: String, value: String) // DTP01/02/03

final case class Clm(
    accountNumber: String,   // CLM01 ClaimSubmitterSIdentifier (hcc:117)
    amount: String,          // CLM02
    facilityCode: String,    // CLM05 component 1 FacilityCodeValue (hcc:239)
    providerSignature: String, // CLM06 YesNoConditionOrResponseCode (hcc:119)
    acceptAssignment: String,  // CLM07 ProviderAcceptAssignmentCode (hcc:118)
    relatedCause1: String,     // CLM11 component 1 (hcc:215-217)
    relatedCause2: String,     // CLM11 component 2
    state: String)             // CLM11 component 4 StateOrProvinceCode (hcc:218)

final case class Sv1(
    procCode: String,        // SV101-2 ProductServiceId (hcc:194)
    m1: String, m2: String, m3: String, m4: String, // SV101-3..6 modifiers
    desc: String,            // SV101-7 Description (hcc:205)
    amount: String,          // SV102 MonetaryAmount (hcc:200)
    quantity: String,        // SV104 Quantity (hcc:201)
    facilityCode: String,    // SV105 FacilityCodeValue (hcc:238)
    p1: String, p2: String, p3: String, p4: String) // SV107-1..4 pointers (hcc:199)

/** A 2010-style name/address loop: NM1 + N3 + N4 (+ qualifier REFs + PER). */
final case class Party(
    nm1: Nm1,
    address: String,         // N301 AddressInformation
    city: String, state: String, zip: String, // N401..N403
    refs: Seq[RefSeg],
    phone: String,           // first PER with CommunicationNumberQualifier TE (hcc:43)
    dmg: Dmg)

final case class L2310A(nm1: Nm1, ref: RefSeg)                  // referring (hcc:143-148)
final case class L2310B(nm1: Nm1, ref: RefSeg, prvId: String)   // rendering (hcc:252-257)
final case class L2320(sbr: Sbr, otherInsured: Nm1)             // other subscriber + 2330A (hcc:89, 109-111)
final case class L2420A(nm1: Nm1, ref: RefSeg, prvId: String)   // line rendering provider (hcc:245-266)

final case class L2400(
    serviceDate: String,     // DTP 472 (hcc:191)
    sv1: Sv1,
    ps1Amount: String,       // PS1 MonetaryAmount (hcc:209)
    l2420a: L2420A,
    svdAmount: String)       // 2430 SVD MonetaryAmount (hcc:206)

final case class L2300(
    clm: Clm,
    diag: Seq[String],       // HI slots 1..4, null-padded to 4 (hcc:136-139)
    dtps: Seq[Dtp],          // claim-level dates: 439/435/096/314/360/361
    note: String,            // NTE Description (hcc:112)
    priorAuth: String,       // first claim-level REF (hcc:116)
    l2310a: L2310A,
    l2310b: L2310B,
    l2310c: Party,           // service facility (hcc:150-160)
    l2320s: Seq[L2320],
    services: Seq[L2400])

final case class ClaimDoc(
    docId: String,           // ST02 transaction control number
    billing: Party,          // 2010AA (hcc:22-46)
    subscriberChildCode: String, // 2000B HL04 HierarchicalChildCode (hcc:299)
    sbr: Sbr,                // subscriber SBR (hcc:60-66, 86-87)
    insured: Party,          // 2010BA (hcc:69-84)
    payer: Party,            // 2010BB (hcc:49-58)
    patientRel: String,      // 2000C PAT01 IndividualRelationshipCode (hcc:95)
    patient: Party,          // 2010CA (hcc:277-296)
    claims: Seq[L2300])
