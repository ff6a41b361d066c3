package graft

/** Smoke for the bench's streaming near-dedup drain harness at toy scale:
  * the corpus replication, chunked file feed, real DedupStreams.ingest
  * drain, and the latency-slope JSON must all function — so a bench-time
  * failure can only be a scale problem, not a harness defect.
  */
class BenchDrainSpec extends SparkSpec {

  test("dedupDrain runs end-to-end and reports per-batch latency metrics") {
    val json = Bench.dedupDrain(spark, sfDir, targetDocs = 1000L, nChunks = 8)
    assert(json != "null", "drain must not fail at toy scale")
    assert(json.contains("\"batches\":8"), s"expected 8 micro-batches: $json")
    val retained = "\"retained\":(\\d+)".r.findFirstMatchIn(json).map(_.group(1).toLong)
    assert(retained.exists(_ > 0), s"no docs retained: $json")
    assert(json.contains("\"slope_ratio\":"), s"missing slope evidence: $json")
  }
}
