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

  test("hot block over the cap routes to representative-star pairs; small blocks stay exact") {
    import spark.implicits._
    // block "hot" has 6 records (> cap 4), block "ok" has 3 (< cap)
    val df = ((1L to 6L).map(i => (i, "hot", s"N$i")) ++
      Seq((10L, "ok", "A"), (11L, "ok", "B"), (12L, "ok", "C"))).toDF("id", "blk", "name")
    val pairs = RecordLinkage.blockedPairs(df, "id", Seq("blk"), blockCap = 4)
    assert(pairs.columns.toSet == Set("blk", "a_id", "a_name", "b_id", "b_name"))
    val got = pairs.select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // ok block: exact 3 pairs; hot block: star around min id 1 — 5 pairs,
    // not the 15 all-pairs the uncapped join would emit
    val star = (2L to 6L).map(i => (1L, i)).toSet
    assert(got == star ++ Set((10L, 11L), (10L, 12L), (11L, 12L)), s"got $got")
  }

  test("hot block with a finer key re-blocks on the compound key, exactly") {
    import spark.implicits._
    val df = ((1L to 6L).map(i => (i, "hot", if (i <= 3) "p" else "q", s"N$i")) ++
      Seq((10L, "ok", "r", "A"), (11L, "ok", "r", "B"))).toDF("id", "blk", "sub", "name")
    val pairs = RecordLinkage.blockedPairs(df, "id", Seq("blk"),
      blockCap = 4, finerKeyCols = Seq("sub"))
    // schema identical to the uncapped form: sub is a data column (a_/b_)
    assert(pairs.columns.toSet == Set("blk", "a_id", "a_sub", "a_name", "b_id", "b_sub", "b_name"))
    val got = pairs.select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // hot block re-blocked on (blk, sub): p = {1,2,3} and q = {4,5,6} all-pairs
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (10L, 11L)),
      s"got $got")
    // within every emitted pair the finer key agrees by construction
    assert(pairs.filter($"a_sub" =!= $"b_sub").count() == 0)
  }

  test("a sub-block still hot after finer-key re-blocking falls through to star pairs") {
    import spark.implicits._
    // hot block of 8; finer key splits 5 ("p", still > cap 4) + 3 ("q")
    val df = ((1L to 5L).map(i => (i, "hot", "p", s"N$i")) ++
      (6L to 8L).map(i => (i, "hot", "q", s"N$i"))).toDF("id", "blk", "sub", "name")
    val pairs = RecordLinkage.blockedPairs(df, "id", Seq("blk"),
      blockCap = 4, finerKeyCols = Seq("sub"))
    val got = pairs.select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // sub-block q (3 <= cap): exact 3 pairs; sub-block p (5 > cap): star
    // around min id 1 — 4 pairs, not the 10 all-pairs
    val star = (2L to 5L).map(i => (1L, i)).toSet
    assert(got == star ++ Set((6L, 7L), (6L, 8L), (7L, 8L)), s"got $got")
    assert(pairs.filter($"a_sub" =!= $"b_sub").count() == 0)
  }

  test("blockCap = Int.MaxValue pins the uncapped exact form") {
    import spark.implicits._
    val df = (1L to 6L).map(i => (i, "x", s"N$i")).toDF("id", "blk", "name")
    val got = RecordLinkage.blockedPairs(df, "id", Seq("blk"), blockCap = Int.MaxValue)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got == (for (a <- 1L to 6L; b <- a + 1 to 6L) yield (a, b)).toSet)
  }

  test("cap high enough leaves results identical to the uncapped all-pairs form") {
    import spark.implicits._
    val df = Seq(
      (1L, "x", "Ann"), (2L, "x", "Anne"), (3L, "x", "Bob"),
      (4L, "y", "Cal"), (5L, "y", "Cab")
    ).toDF("id", "blk", "name")
    val capped = RecordLinkage.blockedPairs(df, "id", Seq("blk"), blockCap = 100)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
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
