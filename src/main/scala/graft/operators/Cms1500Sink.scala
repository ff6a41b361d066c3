package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** S5: the CMS-1500 PDF sink — the reference's terminal operator
  * (`claim.to_pdf(path)`, hippo_claim_crossover.rb:316, rendered there by
  * the external Prawn gem). Spark-first shape: the mapped `claims` and
  * `claim_services` tables are co-partitioned on `claim_id` (one shuffle
  * for the service-line `collect_list`, one co-located join) and every
  * PDF is rendered and written inside `foreachPartition` — executors
  * write their own partitions' files, nothing funnels through the driver,
  * so the sink scales exactly as far as the filesystem does.
  *
  * The renderer is a dependency-free PDF 1.4 writer (text objects +
  * form rules, uncompressed streams, exact xref offsets — the subset of
  * the spec a fixed-layout paper form needs). One page per 6 service
  * lines, as on the paper CMS-1500.
  *
  * `parsed` is the inverse: read the PDFs back (binaryFile source),
  * extract field values from their form coordinates, and return them as
  * a DataFrame — which the q53 oracle compares against the evaluator's
  * expected tables, making the whole render→bytes→parse loop
  * differentially checked rather than "bytes exist".
  */
object Cms1500Sink {

  /** Service lines per page on the paper CMS-1500 (box 24 rows). */
  val LinesPerPage = 6

  // ---- form layout: box name -> (x, y, size) on US Letter (612x792) ----
  // Top-down coordinates follow the paper form's box order; the exact
  // numbers only need to be shared by the renderer and the extractor.
  private val F = 8f // standard field font size
  val Boxes: Map[String, (Float, Float, Float)] = Map(
    "claim_control" -> (430f, 760f, F), // top-right stamp, printer-assigned
    "carrier_name" -> (36f, 740f, F),
    "insured_id" -> (440f, 700f, F), // box 1a
    "patient_name" -> (36f, 676f, F), // box 2
    "patient_dob" -> (240f, 676f, F), // box 3
    "patient_sex" -> (330f, 676f, F),
    "insured_name" -> (370f, 676f, F), // box 4
    "patient_address" -> (36f, 652f, F), // box 5
    "insured_address" -> (370f, 652f, F), // box 7
    "diagnosis_1" -> (46f, 430f, F), // box 21.1
    "diagnosis_2" -> (150f, 430f, F),
    "diagnosis_3" -> (46f, 414f, F),
    "diagnosis_4" -> (150f, 414f, F),
    "federal_tax_id" -> (36f, 180f, F), // box 25
    "patient_account" -> (180f, 180f, F), // box 26
    "total_charge" -> (400f, 180f, F), // box 28
    "billing_provider" -> (370f, 120f, F), // box 33
  )
  // box 24: six service-line rows, top row first
  private val SvcTopY = 380f
  private val SvcRowH = 24f
  private val SvcCols = Seq( // (field, x)
    "svc_date" -> 36f, "svc_pos" -> 120f, "svc_proc" -> 160f,
    "svc_charge" -> 400f, "svc_units" -> 470f)

  private def svcY(rowOnPage: Int): Float = SvcTopY - SvcRowH * rowOnPage

  // ---- minimal PDF 1.4 writer -------------------------------------------

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '\\' => b.append("\\\\")
      case '(' => b.append("\\(")
      case ')' => b.append("\\)")
      case c if c < 32 || c > 255 => b.append('?') // Latin-1 text subset
      case c => b.append(c)
    }
    b.toString
  }

  /** One page's content stream: form rules + absolutely positioned text.
    * PDF operands use Locale.ROOT formatting — the f interpolator is
    * locale-sensitive, and a comma-decimal executor locale (de_DE) would
    * emit "36,0", an invalid PDF number.
    */
  private def num(v: Float): String =
    String.format(java.util.Locale.ROOT, "%.1f", Float.box(v))

  private def contentStream(
      texts: Seq[(Float, Float, Float, String)], rules: Seq[(Float, Float, Float, Float)]): String = {
    val sb = new StringBuilder
    rules.foreach { case (x, y, w, h) =>
      sb.append(s"0.5 w ${num(x)} ${num(y)} ${num(w)} ${num(h)} re S\n")
    }
    texts.foreach { case (x, y, size, t) =>
      if (t != null && t.nonEmpty)
        sb.append(s"BT /F1 ${num(size)} Tf 1 0 0 1 ${num(x)} ${num(y)} Tm (${esc(t)}) Tj ET\n")
    }
    sb.toString
  }

  /** Assemble a multi-page PDF: catalog, page tree, one shared Type1
    * Helvetica, one content stream per page, exact xref offsets.
    */
  def assemble(pages: Seq[String]): Array[Byte] = {
    val n = pages.length
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    val kids = (0 until n).map(i => s"${4 + i} 0 R").mkString(" ")
    objs += "<< /Type /Catalog /Pages 2 0 R >>"
    objs += s"<< /Type /Pages /Kids [$kids] /Count $n >>"
    objs += "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    (0 until n).foreach { i =>
      objs += ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${4 + n + i} 0 R >>")
    }
    pages.foreach { s =>
      objs += s"<< /Length ${s.getBytes("ISO-8859-1").length} >>\nstream\n${s}endstream"
    }
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = out.size()
      w(s"${i + 1} 0 obj\n$body\nendobj\n")
      off
    }
    val xrefOff = out.size()
    w(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o =>
      w(String.format(java.util.Locale.ROOT, "%010d 00000 n \n", Integer.valueOf(o))))
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // ---- claim -> PDF ------------------------------------------------------

  private val Mdy = java.time.format.DateTimeFormatter.ofPattern("MM/dd/yyyy")
  private def mdy(d: java.sql.Date): String =
    if (d == null) null else d.toLocalDate.format(Mdy)

  private def formRules: Seq[(Float, Float, Float, Float)] = Seq(
    (30f, 100f, 552f, 660f), // form frame
    (30f, 400f, 552f, 0f), // box 24 top rule
    (30f, 170f, 552f, 0f)) // bottom band rule

  /** Render one claim (wide row + its sorted service-line structs). */
  def render(c: Row, services: scala.collection.Seq[Row]): Array[Byte] = {
    def s(col: String): String =
      if (c.isNullAt(c.fieldIndex(col))) null else String.valueOf(c.getAs[Any](col))
    def d(col: String): String = mdy(c.getAs[java.sql.Date](col))
    val total = services.foldLeft(java.math.BigDecimal.ZERO) { (acc, r) =>
      val ch = r.getAs[java.lang.Double]("charges")
      if (ch == null) acc else acc.add(java.math.BigDecimal.valueOf(ch))
    }.setScale(2, java.math.RoundingMode.HALF_UP)
    def at(box: String, v: String): (Float, Float, Float, String) = {
      val (x, y, sz) = Boxes(box); (x, y, sz, v)
    }
    val fixed = Seq(
      at("claim_control", s("claim_id")),
      at("carrier_name", s("carrier_name")),
      at("insured_id", s("insured_id_number")),
      at("patient_name", s("patient_name")),
      at("patient_dob", d("patient_date_of_birth")),
      at("patient_sex", s("patient_sex")),
      at("insured_name", s("insured_name")),
      at("patient_address", s("patient_address")),
      at("insured_address", s("insured_address")),
      at("diagnosis_1", s("diagnosis_code_1")),
      at("diagnosis_2", s("diagnosis_code_2")),
      at("diagnosis_3", s("diagnosis_code_3")),
      at("diagnosis_4", s("diagnosis_code_4")),
      at("federal_tax_id", s("federal_tax_id")),
      at("patient_account", s("patient_account_number")))
    val pageGroups =
      if (services.isEmpty) Seq(Seq.empty[Row])
      else services.grouped(LinesPerPage).toSeq
    val pages = pageGroups.zipWithIndex.map { case (grp, pi) =>
      val svcTexts = grp.zipWithIndex.flatMap { case (r, row) =>
        def sv(col: String): String =
          if (r.isNullAt(r.fieldIndex(col))) null else String.valueOf(r.getAs[Any](col))
        val y = svcY(row)
        Seq(
          (SvcCols(0)._2, y, F, mdy(r.getAs[java.sql.Date]("date_of_service_from"))),
          (SvcCols(1)._2, y, F, sv("place_of_service")),
          (SvcCols(2)._2, y, F, sv("procedure_code")),
          (SvcCols(3)._2, y, F, {
            val ch = r.getAs[java.lang.Double]("charges")
            if (ch == null) null
            else java.math.BigDecimal.valueOf(ch).setScale(2, java.math.RoundingMode.HALF_UP).toPlainString
          }),
          (SvcCols(4)._2, y, F, sv("days_or_units")))
      }
      val lastPage = pi == pageGroups.length - 1
      val totals = if (lastPage) Seq(at("total_charge", total.toPlainString),
        at("billing_provider", s("billing_provider_name"))) else Seq.empty
      contentStream(fixed ++ svcTexts ++ totals, formRules)
    }
    assemble(pages)
  }

  /** The service-line struct columns `write`/`parsed` agree on. */
  private val SvcStructCols = Seq(
    "line_no", "date_of_service_from", "place_of_service", "procedure_code",
    "charges", "days_or_units")

  /** S5 sink: one `<claim_id>.pdf` per claim under `outDir`. One shuffle
    * (service-line collect_list on claim_id) + a co-partitioned left join;
    * rendering and file IO happen per-partition on the executors.
    */
  def write(claims: DataFrame, services: DataFrame, outDir: String): Unit = {
    val svc = services
      .groupBy(col("claim_id"))
      .agg(sort_array(collect_list(struct(SvcStructCols.map(col): _*))).as("svc"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    claims.join(svc, Seq("claim_id"), "left")
      .foreachPartition { (rows: Iterator[Row]) =>
        rows.foreach { r =>
          val id = r.getAs[String]("claim_id")
          val lines = Option(r.getAs[scala.collection.Seq[Row]]("svc")).getOrElse(Seq.empty)
          val pdf = render(r, lines)
          java.nio.file.Files.write(java.nio.file.Paths.get(outDir, s"$id.pdf"), pdf)
        }
      }
  }

  // ---- PDF -> fields (the differential read-back) ------------------------

  private val TextOp =
    """BT /F1 ([\d.]+) Tf 1 0 0 1 ([\d.]+) ([\d.]+) Tm \(((?:\\.|[^()\\])*)\) Tj ET""".r
  private val StreamRe = """(?s)stream\n(.*?)endstream""".r
  private val CountRe = """/Count (\d+)""".r

  private def unesc(s: String): String =
    s.replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")

  /** All text ops in the document as ((x, y), text), page streams in order. */
  def extractTexts(pdf: Array[Byte]): Seq[((Float, Float), String)] = {
    val doc = new String(pdf, "ISO-8859-1")
    StreamRe.findAllMatchIn(doc).toSeq.flatMap { m =>
      TextOp.findAllMatchIn(m.group(1)).map { t =>
        ((t.group(2).toFloat, t.group(3).toFloat), unesc(t.group(4)))
      }
    }
  }

  def pageCount(pdf: Array[Byte]): Int =
    CountRe.findFirstMatchIn(new String(pdf, "ISO-8859-1")).map(_.group(1).toInt).getOrElse(0)

  /** Read every PDF under `dir` and extract the q53 check columns from
    * their form coordinates. binaryFile splits per file; extraction is a
    * row-local map.
    */
  def parsed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val boxOf = Boxes // avoid serializing the outer object
    spark.read.format("binaryFile").option("pathGlobFilter", "*.pdf").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (_, bytes) =>
        val texts = extractTexts(bytes).toMap
        def box(name: String): Option[String] = texts.get((boxOf(name)._1, boxOf(name)._2))
        (box("claim_control").orNull,
          pageCount(bytes),
          box("patient_name").orNull,
          box("patient_dob").orNull,
          box("insured_name").orNull,
          box("diagnosis_1").orNull,
          box("total_charge").map(_.toDouble).getOrElse(0.0))
      }
      .toDF("claim_id", "n_pages", "patient_name", "patient_dob",
        "insured_name", "diagnosis_1", "total_charge")
  }
}
