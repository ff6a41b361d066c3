package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {

  test("blocked pairs: within-block a<b pairs only, both sides' columns prefixed") {
    import spark.implicits._
    val df = Seq(
      (1L, "x", "Ann"), (2L, "x", "Anne"), (3L, "x", "Bob"),
      (4L, "y", "Cal"), (5L, "y", "Cab")
    ).toDF("id", "blk", "name")
    val pairs = RecordLinkage.blockedPairs(df, "id", Seq("blk"))
    assert(pairs.columns.toSet == Set("blk", "a_id", "a_name", "b_id", "b_name"))
    val got = pairs.select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // block x: 3 pairs; block y: 1 pair; never across blocks
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("banded levenshtein scoring matches the unbounded form at the threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, "x", "Customer#001"), (2L, "x", "Customer#002"),
      (3L, "x", "Totally Different")
    ).toDF("id", "blk", "name")
    val pairs = RecordLinkage.blockedPairs(df, "id", Seq("blk"))
    val both = pairs.select($"a_id", $"b_id",
        levenshtein($"a_name", $"b_name").as("full"),
        levenshtein($"a_name", $"b_name", 2).as("banded"))
      .collect()
    both.foreach { r =>
      val (full, banded) = (r.getInt(2), r.getInt(3))
      assert((full <= 2) == (banded != -1), s"row $r")
      if (banded != -1) assert(banded == full, s"row $r")
    }
    assert(both.count(_.getInt(3) != -1) == 1) // only the 001/002 pair
  }
}
