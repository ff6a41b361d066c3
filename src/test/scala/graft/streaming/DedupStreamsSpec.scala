package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online (incremental) near-dup dedup: the streaming ingest must drop
  * copies of already-retained documents using only the signature index
  * — never the historical text — and its result must not depend on how
  * the corpus was batched.
  */
class DedupStreamsSpec extends SparkSpec {

  import spark.implicits._

  // a corpus with exact copies, a near-copy, and unrelated docs; ids
  // spread across batches so cross-batch dedup is actually exercised
  private def corpus: DataFrame = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again today",
    2L -> "completely different content about spark physical plans and shuffles",
    3L -> "the quick brown fox jumps over the lazy dog again and again today",
    4L -> "third unrelated document mentioning parquet statistics and pruning",
    5L -> "the quick brown fox jumps over the lazy dog again and again yesterday",
    6L -> "completely different content about spark physical plans and shuffles",
    7L -> "ab" // shorter than the shingle width: no signature, always retained
  ).toDF("doc_id", "text")

  private def runBatched(slices: Seq[Seq[Long]]): Set[Long] = {
    val root = Files.createTempDirectory("dedup_stream").toString
    val out = s"$root/out"; val idx = s"$root/index"
    slices.zipWithIndex.foreach { case (ids, i) =>
      DedupStreams.dedupBatch(
        corpus.filter(col("doc_id").isin(ids: _*)), out, idx, threshold = 0.7, batchId = i)
    }
    spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSet
  }

  test("copies of retained docs are dropped across batches via the signature index alone") {
    val survivors = runBatched(Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L, 7L)))
    // 3 and 6 are exact copies of retained 1 and 2; 5 is a near-copy of 1
    // (one word differs); 7 is sub-shingle-width and passes through
    assert(survivors == Set(1L, 2L, 4L, 7L))
  }

  test("survivors are independent of batching (one batch vs three)") {
    val oneBatch = runBatched(Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)))
    val threeBatches = runBatched(Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L, 7L)))
    val perDoc = runBatched((1L to 7L).map(Seq(_)))
    assert(oneBatch == threeBatches && threeBatches == perDoc)
  }

  test("a replayed batch (same id) is idempotent - no duplicate survivors") {
    val root = Files.createTempDirectory("dedup_stream_replay").toString
    val out = s"$root/out"; val idx = s"$root/index"
    DedupStreams.dedupBatch(
      corpus.filter(col("doc_id") <= 2), out, idx, threshold = 0.7, batchId = 0)
    // simulate foreachBatch redelivery after a crash: same batch, same id
    DedupStreams.dedupBatch(
      corpus.filter(col("doc_id") <= 2), out, idx, threshold = 0.7, batchId = 0)
    val rows = spark.read.parquet(out).select(col("doc_id")).as[Long].collect().toSeq
    assert(rows.sorted == Seq(1L, 2L), s"replay must overwrite, not append: $rows")
  }

  test("streaming ingest end-to-end drains a replay directory with dedup applied") {
    val root = Files.createTempDirectory("dedup_stream_e2e").toString
    val in = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    corpus.coalesce(1).write.json(s"$in/batch0")
    val schema = corpus.schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .json(s"$in/*")
    val q = DedupStreams.ingest(stream, s"$root/out", s"$root/index", s"$root/ckpt")
    q.awaitTermination(120000)
    val survivors = spark.read.parquet(s"$root/out")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 4L, 7L))
  }
}
