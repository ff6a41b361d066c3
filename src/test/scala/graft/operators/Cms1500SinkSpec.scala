package graft.operators

import graft.SparkSpec
import graft.edi.ClaimMapping
import graft.fixtures.ClaimFixtures

/** S5 sink checks: structural PDF validity (header, xref offsets, EOF),
  * page chunking at 6 service lines, string escaping round-trip, and the
  * end-to-end write-then-parse loop over the fixture corpus (the field
  * -value comparison itself is q53's oracle; here we assert the loop is
  * lossless for the structural pieces the oracle can't see).
  */
class Cms1500SinkSpec extends SparkSpec {

  private def doc = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ClaimFixtures.EdiDir, "D0000.txt")), "UTF-8")

  test("assembled PDF has a valid header, xref table, and trailer") {
    val pdf = Cms1500Sink.assemble(Seq("BT /F1 8.0 Tf 1 0 0 1 36.0 700.0 Tm (hi) Tj ET\n"))
    val s = new String(pdf, "ISO-8859-1")
    assert(s.startsWith("%PDF-1.4\n"))
    assert(s.endsWith("%%EOF\n"))
    // startxref points at the literal xref table
    val xrefOff = s.substring(s.lastIndexOf("startxref\n") + 10).trim.takeWhile(_.isDigit).toInt
    assert(s.substring(xrefOff).startsWith("xref"))
    // every xref entry points at the matching "N 0 obj" header
    val entries = """(\d{10}) 00000 n""".r.findAllMatchIn(s).map(_.group(1).toInt).toSeq
    entries.zipWithIndex.foreach { case (off, i) =>
      assert(s.substring(off).startsWith(s"${i + 1} 0 obj"), s"object ${i + 1}")
    }
  }

  test("text strings with PDF delimiters survive the render/extract round trip") {
    val tricky = """paren (both) and back\slash"""
    val pdf = Cms1500Sink.assemble(
      Seq(s"BT /F1 8.0 Tf 1 0 0 1 36.0 700.0 Tm (${"""paren \(both\) and back\\slash"""}) Tj ET\n"))
    val texts = Cms1500Sink.extractTexts(pdf)
    assert(texts == Seq(((36.0f, 700.0f), tricky)))
  }

  test("service lines chunk into pages of 6 and the total lands on the last page") {
    ClaimFixtures.writeEdi() // no-op when fixtures exist
    val spark2 = spark
    import spark2.implicits._
    val docs = ClaimMapping.parseDocs(spark, spark.createDataset(Seq(doc)))
    val claims = ClaimMapping.claims(spark, docs).collect()
    val services = ClaimMapping.claimServices(spark, docs).collect()
    assert(claims.nonEmpty)
    val c = claims.head
    val svc = services.filter(_.getAs[String]("claim_id") == c.getAs[String]("claim_id")).toSeq
    val pdf = Cms1500Sink.render(c, svc)
    val expPages = math.max(1, math.ceil(svc.size / 6.0).toInt)
    assert(Cms1500Sink.pageCount(pdf) == expPages)
    val texts = Cms1500Sink.extractTexts(pdf).toMap
    val (tx, ty, _) = Cms1500Sink.Boxes("total_charge")
    val total = svc.flatMap(r => Option(r.getAs[java.lang.Double]("charges")).map(BigDecimal(_)))
      .sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
    assert(texts((tx, ty)) == total.underlying.toPlainString)
  }

  test("write() produces one parseable PDF per claim on the executors") {
    ClaimFixtures.writeEdi()
    val docs = ClaimMapping.readDocs(spark, ClaimFixtures.EdiDir)
    val claims = ClaimMapping.claims(spark, docs)
    val services = ClaimMapping.claimServices(spark, docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf_spec").toString
    Cms1500Sink.write(claims, services, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".pdf"))
    assert(files.length == claims.count())
    val sample = java.nio.file.Files.readAllBytes(files.minBy(_.getName).toPath)
    assert(new String(sample, "ISO-8859-1").startsWith("%PDF-1.4"))
    assert(Cms1500Sink.extractTexts(sample).nonEmpty)
  }
}
