package graft.operators

import graft.SparkSpec
import graft.fixtures.ClaimFixtures
import org.apache.spark.sql.functions._

/** L5 multimodal plumbing over the EDI corpus as binary fixtures: source
  * scan metadata, sniffing, stub feature extraction shape, frame sampling.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val binaries = {
    ClaimFixtures.writeEdi()
    Multimodal.readBinaryDir(spark, ClaimFixtures.EdiDir, "*.txt").cache()
  }

  test("binary source exposes path/length/content for every fixture file") {
    assert(binaries.count() == ClaimFixtures.NumDocs)
    val row = binaries.orderBy(col("path")).select("length", "content").head()
    assert(row.getLong(0) == row.getAs[Array[Byte]](1).length.toLong)
  }

  test("manifest hashes match spark-side sha2 of content") {
    val m = Multimodal.manifest(binaries)
    assert(m.select(countDistinct(col("sha256"))).head().getLong(0) == ClaimFixtures.NumDocs)
    assert(m.filter(length(col("sha256")) =!= 64).count() == 0)
  }

  test("stub feature extraction yields fixed-dim normalized histograms and sniffed kind") {
    val f = Multimodal.extractFeatures(spark, binaries).cache()
    assert(f.count() == ClaimFixtures.NumDocs)
    val r = f.head()
    assert(r.features.length == Multimodal.FeatureDim)
    assert(math.abs(r.features.sum - 1.0f) < 1e-3) // histogram normalized
    assert(f.filter(_.kind != "x12").count() == 0)  // EDI docs start with ST
  }

  test("sniffKind recognizes magic bytes") {
    assert(Multimodal.sniffKind(Array(0x89.toByte, 'P', 'N', 'G')) == "png")
    assert(Multimodal.sniffKind(Array(0xff.toByte, 0xd8.toByte, 1, 2)) == "jpeg")
    assert(Multimodal.sniffKind("RIFF1234".getBytes) == "riff")
    assert(Multimodal.sniffKind("ST*837".getBytes) == "x12")
    assert(Multimodal.sniffKind(Array[Byte](1, 2, 3)) == "bin")
  }

  test("frame sampler emits n windows per file with stable schema") {
    val frames = Multimodal.sampleFrames(spark, binaries, 4)
    assert(frames.count() == ClaimFixtures.NumDocs * 4)
    assert(frames.columns.toSeq == Seq("file_name", "frame_no", "frame_bytes"))
    val sizes = frames.select(length(col("frame_bytes")).as("n"))
      .agg(min(col("n")), max(col("n"))).head()
    assert(sizes.getInt(1) <= 64)
  }

  test("a custom MediaCodec plugs into the same operators (the deployment seam)") {
    // "codec" that decodes every item to a constant vector and one frame —
    // stands in for a JNI-backed implementation; proves the operators take
    // their decode behavior from the trait, not from the stub
    object ConstCodec extends MediaCodec {
      override val featureDim: Int = 2
      override def openSession(): MediaCodec.Session = new MediaCodec.Session {
        override def decodeFeatures(bytes: Array[Byte]): Array[Float] =
          Array(bytes.length.toFloat, 42f)
        override def sampleFrames(bytes: Array[Byte], n: Int): IndexedSeq[Array[Byte]] =
          IndexedSeq(bytes.take(2))
      }
    }
    val f = Multimodal.extractFeatures(spark, binaries, ConstCodec)
    assert(f.head().features.toSeq == Seq(f.head().nBytes.toFloat, 42f))
    val frames = Multimodal.sampleFrames(spark, binaries, 4, ConstCodec)
    assert(frames.count() == ClaimFixtures.NumDocs) // ConstCodec emits 1 frame
    assert(frames.columns.toSeq == Seq("file_name", "frame_no", "frame_bytes"))
  }
}
