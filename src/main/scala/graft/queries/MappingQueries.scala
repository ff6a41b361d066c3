package graft.queries

import graft.QueryDef
import graft.edi.ClaimMapping
import graft.fixtures.{ClaimFixtures, Evaluator}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, posexplode}

/** The reference-fidelity mapping queries (SURVEY.md §2.14 Q41–Q43): parse
  * the generated 837P corpus, normalize to claims / claim_services /
  * claim_diagnoses, and hash-compare against the independent evaluator's
  * expected parquet via DuckDB.
  *
  * These run on the fixture corpus (FIXTURES.md §2), not the sf testdata —
  * the `dir` argument is ignored by design.
  */
object MappingQueries {

  @volatile private var materialized = false

  /** Write the EDI corpus + expected parquet once per JVM. Generation is
    * deterministic (fixed seeds) and the outputs are committed, so existing
    * fixtures are reused unless GRAFT_REGEN_FIXTURES=1 forces a rebuild
    * (set it after changing the generator or evaluator).
    */
  private def ensure(spark: SparkSession): Unit = synchronized {
    if (!materialized) {
      val force = sys.env.get("GRAFT_REGEN_FIXTURES").contains("1")
      def missing(p: String): Boolean =
        !java.nio.file.Files.exists(java.nio.file.Paths.get(p, "_SUCCESS"))
      if (force || !java.nio.file.Files.exists(
        java.nio.file.Paths.get(ClaimFixtures.EdiDir, "D0000.txt")))
        ClaimFixtures.writeEdi()
      val tables = Seq(
        "claims.parquet" -> (() => Evaluator.expectedClaims(spark)),
        "claim_services.parquet" -> (() => Evaluator.expectedServices(spark)),
        "claim_diagnoses.parquet" -> (() => Evaluator.expectedDiagnoses(spark)),
        "media_manifest.parquet" -> (() => Evaluator.expectedManifest(spark)),
        "media_features.parquet" -> (() => Evaluator.expectedMediaFeatures(spark)))
      tables.foreach { case (name, df) =>
        val path = s"${ClaimFixtures.ExpectedDir}/$name"
        if (force || missing(path))
          df().coalesce(1).write.mode("overwrite").parquet(path)
      }
      materialized = true
    }
  }

  private def expected(table: String): String =
    s"SELECT * FROM read_parquet('${ClaimFixtures.ExpectedDir}/$table.parquet/*.parquet')"

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q41_claims_mapping",
      s"${expected("claims")} ORDER BY claim_id",
    ) { (spark, _) =>
      ensure(spark)
      ClaimMapping.claims(spark, ClaimMapping.readDocs(spark, ClaimFixtures.EdiDir))
        .orderBy(col("claim_id"))
    },
    QueryDef(
      "q42_claim_services",
      s"${expected("claim_services")} ORDER BY claim_id, line_no",
    ) { (spark, _) =>
      ensure(spark)
      ClaimMapping.claimServices(spark, ClaimMapping.readDocs(spark, ClaimFixtures.EdiDir))
        .orderBy(col("claim_id"), col("line_no"))
    },
    QueryDef(
      "q43_claim_diagnoses",
      s"${expected("claim_diagnoses")} ORDER BY claim_id, slot",
    ) { (spark, _) =>
      ensure(spark)
      ClaimMapping.claimDiagnoses(spark, ClaimMapping.readDocs(spark, ClaimFixtures.EdiDir))
        .orderBy(col("claim_id"), col("slot"))
    },
    // L5 multimodal: binary source scan + metadata vs the evaluator's
    // independently computed byte counts and sha256 digests (SURVEY Q39)
    QueryDef(
      "q45_media_manifest",
      s"${expected("media_manifest")} ORDER BY file_name",
    ) { (spark, _) =>
      ensure(spark)
      graft.operators.Multimodal.manifest(
        graft.operators.Multimodal.readBinaryDir(spark, ClaimFixtures.EdiDir, "*.txt"))
        .orderBy(col("file_name"))
    },
    // S5: the PDF sink, checked as a round trip — claims are rendered to
    // CMS-1500 PDFs on the executors (foreachPartition file writes), the
    // PDFs are read back via binaryFile and field values are extracted
    // from their form coordinates; the oracle recomputes the same fields
    // (incl. the box-28 total and page count) from the evaluator parquet.
    QueryDef(
      "q53_pdf_render",
      s"""WITH s AS (
         |  SELECT claim_id, count(*) AS n_lines,
         |         CAST(round(sum(CAST(charges AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_charge
         |  FROM read_parquet('${ClaimFixtures.ExpectedDir}/claim_services.parquet/*.parquet')
         |  GROUP BY claim_id
         |)
         |SELECT c.claim_id,
         |       CAST(GREATEST(CEIL(COALESCE(s.n_lines, 0) / 6.0), 1) AS INT) AS n_pages,
         |       c.patient_name,
         |       strftime(c.patient_date_of_birth, '%m/%d/%Y') AS patient_dob,
         |       c.insured_name,
         |       c.diagnosis_code_1 AS diagnosis_1,
         |       COALESCE(s.total_charge, 0.0) AS total_charge
         |FROM read_parquet('${ClaimFixtures.ExpectedDir}/claims.parquet/*.parquet') c
         |LEFT JOIN s USING (claim_id)
         |ORDER BY c.claim_id""".stripMargin,
    ) { (spark, _) =>
      ensure(spark)
      val docs = ClaimMapping.readDocs(spark, ClaimFixtures.EdiDir)
      val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_pdf_out"
      // stale PDFs from a previous corpus would leak extra rows into the
      // read-back; start from an empty sink dir every run
      val dirPath = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(dirPath)) {
        val s = java.nio.file.Files.list(dirPath)
        try s.forEach(p => java.nio.file.Files.delete(p)) finally s.close()
      }
      graft.operators.Cms1500Sink.write(
        ClaimMapping.claims(spark, docs),
        ClaimMapping.claimServices(spark, docs), dir)
      graft.operators.Cms1500Sink.parsed(spark, dir).orderBy(col("claim_id"))
    },
    // L5 stub decode path, hash-gated against the evaluator's plain-Scala
    // re-computation of the same deterministic featurizer (q45 pattern)
    QueryDef(
      "q46_media_features",
      s"${expected("media_features")} ORDER BY file_name",
    ) { (spark, _) =>
      import org.apache.spark.sql.functions.{aggregate, element_at, lit, round}
      ensure(spark)
      graft.operators.Multimodal.extractFeatures(spark,
        graft.operators.Multimodal.readBinaryDir(spark, ClaimFixtures.EdiDir, "*.txt"))
        .toDF()
        .select(col("fileName").as("file_name"), col("nBytes").as("n_bytes"), col("kind"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
          round(aggregate(col("features"), lit(0.0d), (a, x) => a + x), 4).as("feature_sum"))
        .orderBy(col("file_name"))
    },
    // L5 frame sampling: the video-pipeline explode shape (one media item
    // -> n evenly spaced frames) with the stub byte-window "decoder"; the
    // oracle recomputes the identical windows from the same files via
    // DuckDB's read_text (the corpus is ASCII, so char slices == byte
    // slices) — schema, spacing arithmetic, and per-frame digests are all
    // what a codec-backed sampler would ship.
    QueryDef(
      "q92_media_frames",
      s"""WITH f AS (
         |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name, content
         |  FROM read_text('${ClaimFixtures.EdiDir}/*.txt')
         |), fr AS (
         |  SELECT file_name, i AS frame_no,
         |         substr(content,
         |           CAST(floor(i * greatest(length(content) - 64, 0) / 4.0) AS INT) + 1,
         |           64) AS fb
         |  FROM f, range(0, 5) t(i)
         |)
         |SELECT file_name, frame_no::INT AS frame_no,
         |       length(fb)::BIGINT AS n_bytes, md5(fb) AS frame_hash
         |FROM fr ORDER BY file_name, frame_no""".stripMargin,
    ) { (spark, _) =>
      import org.apache.spark.sql.functions.{length, md5}
      ensure(spark)
      graft.operators.Multimodal.sampleFrames(spark,
        graft.operators.Multimodal.readBinaryDir(spark, ClaimFixtures.EdiDir, "*.txt"), 5)
        .select(col("file_name"), col("frame_no"),
          length(col("frame_bytes")).cast("long").as("n_bytes"),
          md5(col("frame_bytes")).as("frame_hash"))
        .orderBy(col("file_name"), col("frame_no"))
    },
    // L5 x L2: media near-dup by frame fingerprints — the video-dedup
    // shape: every item yields 5 sampled-frame hashes; near-dup pairs
    // fall out of a hash-EQUALITY self-join (bucket join — no all-pairs
    // enumeration, the same posture as every text near-dup path; at
    // corpus scale hot frame hashes are the skew case and land on AQE).
    // Byte-histogram cosine was measured NON-discriminative on this
    // corpus (unrelated pairs reach 0.9995); exact frame windows are
    // fully discriminative (zero cross-file collisions). Derived
    // cohorts: byte-identical copies (ids % 5 = 0 -> share all 5
    // frames), tail-trimmed copies (ids % 7 = 1, last 100 bytes cut ->
    // share exactly frame 0: later frame OFFSETS shift with the length),
    // and their overlap (ids % 35 = 15 -> copy-trim pairs). ------------
    QueryDef(
      "q125_media_neardup",
      s"""WITH raw AS (
         |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name, content
         |  FROM read_text('${ClaimFixtures.EdiDir}/*.txt')
         |), u AS (
         |  SELECT file_name, content FROM raw
         |  UNION ALL
         |  SELECT file_name || '.copy', content FROM raw
         |  WHERE CAST(regexp_extract(file_name, 'D(\\d+)', 1) AS INT) % 5 = 0
         |  UNION ALL
         |  SELECT file_name || '.trim', substr(content, 1, length(content) - 100) FROM raw
         |  WHERE CAST(regexp_extract(file_name, 'D(\\d+)', 1) AS INT) % 7 = 1
         |), fr AS (
         |  SELECT DISTINCT file_name,
         |         md5(substr(content,
         |           CAST(floor(i * greatest(length(content) - 64, 0) / 4.0) AS INT) + 1,
         |           64)) AS fh
         |  FROM u, range(0, 5) t(i)
         |), p AS (
         |  SELECT a.file_name AS fa, b.file_name AS fb, count(DISTINCT a.fh) AS shared
         |  FROM fr a JOIN fr b ON a.fh = b.fh AND a.file_name < b.file_name
         |  GROUP BY 1, 2
         |), cls AS (
         |  SELECT shared,
         |    CASE WHEN regexp_replace(fa, '\\.(copy|trim)$$', '')
         |              <> regexp_replace(fb, '\\.(copy|trim)$$', '') THEN 'unrelated'
         |         WHEN fb LIKE '%.copy' THEN 'orig-copy'
         |         WHEN fa LIKE '%.copy' THEN 'copy-trim'
         |         ELSE 'orig-trim' END AS relation,
         |    CAST(regexp_extract(fa, 'D(\\d+)', 1) AS BIGINT) AS ia,
         |    CAST(regexp_extract(fb, 'D(\\d+)', 1) AS BIGINT) AS ib
         |  FROM p
         |)
         |SELECT relation, shared::BIGINT AS shared_frames, count(*)::BIGINT AS n_pairs,
         |       CAST(sum(ia * 1009 + ib) AS BIGINT) AS pair_checksum
         |FROM cls GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    ) { (spark, _) =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      ensure(spark)
      val bin = graft.operators.Multimodal
        .readBinaryDir(spark, ClaimFixtures.EdiDir, "*.txt")
        .select(col("path"), col("length"), col("content"))
      val fid = regexp_extract(col("path"), "D(\\d+)\\.txt$", 1).cast("int")
      val copies = bin.filter(fid % 5 === 0)
        .select(concat(col("path"), lit(".copy")).as("path"), col("content"))
      val trims = bin.filter(fid % 7 === 1)
        .select(concat(col("path"), lit(".trim")).as("path"),
          expr("substring(content, 1, cast(length - 100 as int))").as("content"))
      val corpus = bin.select(col("path"), col("content"))
        .unionByName(copies).unionByName(trims)
      val fr = graft.operators.Multimodal.sampleFrames(spark, corpus, 5)
        .select(col("file_name"), md5(col("frame_bytes")).as("fh"))
        .distinct()
      val pairs = fr.as("a")
        .join(fr.as("b"), $"a.fh" === $"b.fh" && $"a.file_name" < $"b.file_name")
        .groupBy($"a.file_name".as("fa"), $"b.file_name".as("fb"))
        .agg(countDistinct($"a.fh").as("shared"))
      val base = (c: org.apache.spark.sql.Column) =>
        regexp_replace(c, "\\.(copy|trim)$", "")
      pairs
        .select($"shared",
          when(base($"fa") =!= base($"fb"), lit("unrelated"))
            .when($"fb".endsWith(".copy"), lit("orig-copy"))
            .when($"fa".endsWith(".copy"), lit("copy-trim"))
            .otherwise(lit("orig-trim")).as("relation"),
          regexp_extract($"fa", "D(\\d+)", 1).cast("long").as("ia"),
          regexp_extract($"fb", "D(\\d+)", 1).cast("long").as("ib"))
        .groupBy($"relation", $"shared".as("shared_frames"))
        .agg(count(lit(1)).as("n_pairs"),
          sum($"ia" * 1009 + $"ib").cast("long").as("pair_checksum"))
        .orderBy($"relation", $"shared_frames")
    },

    // ---- q132: REAL image decode through the codec seam (BmpCodec
    // scaladoc) — the L5 gate the stub can't give: 40 deterministic
    // 24-bit BMPs (BmpFixtures; closed-form pixels, non-mult-of-4
    // widths) decoded executor-side into 4x4 channel-weighted cell sums,
    // while the oracle recomputes the SAME sums from the pixel formula
    // with integer arithmetic — no image library on either side, real
    // bottom-up/BGR/stride-padded binary in between. n_bytes doubles as
    // the encoder gate (54 + stride*h). ---------------------------------
    QueryDef(
      "q132_bmp_decode",
      """WITH d AS (
        |  SELECT k, 16 + (7*k)%49 AS w, 12 + (5*k)%37 AS h FROM range(0, 40) t(k)
        |), px AS (
        |  SELECT d.k, d.w, d.h,
        |         ((y.j*4)//d.h)*4 + (x.i*4)//d.w AS cell,
        |         (11*d.k + 3*x.i + 7*y.j)%256
        |           + 2*((13*d.k + 5*x.i + 11*y.j)%256)
        |           + 4*((17*d.k + 7*x.i + 13*y.j)%256) AS s
        |  FROM d, range(0, 64) x(i), range(0, 48) y(j)
        |  WHERE x.i < d.w AND y.j < d.h
        |)
        |SELECT 'img' || k || '.bmp' AS file_name,
        |       CAST(54 + ((w*3+3)//4)*4*h AS BIGINT) AS n_bytes,
        |       CAST(cell AS INT) AS cell,
        |       CAST(sum(s) AS BIGINT) AS cell_sum
        |FROM px GROUP BY k, w, h, cell
        |ORDER BY file_name, cell""".stripMargin,
    ) { (spark, _) =>
      graft.fixtures.BmpFixtures.ensure()
      val bin = graft.operators.Multimodal.readBinaryDir(
        spark, graft.fixtures.BmpFixtures.Dir, "*.bmp")
      graft.operators.Multimodal
        .extractFeatures(spark, bin, graft.operators.BmpCodec)
        .toDF()
        .select(col("fileName").as("file_name"), col("nBytes").cast("long").as("n_bytes"),
          posexplode(col("features")))
        .select(col("file_name"), col("n_bytes"),
          col("pos").cast("int").as("cell"), col("col").cast("long").as("cell_sum"))
        .orderBy(col("file_name"), col("cell"))
    },
  )
}
