package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state grouped top-k (SURVEY.md §2.7 A8 family): keeps the k
  * best (score, id) pairs per group inside the AGGREGATE buffer, so the
  * map side combines each partition down to ≤ k pairs per group before
  * the shuffle.
  *
  * The textbook spelling (q21: row_number window + filter) shuffles and
  * sorts EVERY row of every group; at 100 TB a hot group's full history
  * crosses the wire to one task before all but k rows are discarded.
  * Here the shuffle carries ≤ (#groups × #partitions × k) pairs — the
  * same partial-aggregation geometry as a built-in min/max, because the
  * Aggregator reduce/merge ARE the map-side/shuffle-side combines.
  *
  * Ordering contract: best = highest (score, then LOWEST id as the
  * deterministic tiebreak). Both reduce and merge maintain the buffer
  * sorted, so the result is independent of row order and partitioning —
  * gate-comparable against a window oracle.
  */
object TopK {

  /** Packed top-k buffer: [s0, id0, s1, id1, ...] sorted best-first;
    * finish unpacks to (score, id) pairs for a plain posexplode.
    */
  final class TopKAggregator(k: Int)
      extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
    require(k > 0 && k <= 1024, s"k=$k out of the bounded-buffer regime")

    override def zero: Array[Long] = Array.emptyLongArray

    // (s, id) beats (s2, id2) iff s > s2, or s == s2 && id < id2
    private def beats(s: Long, id: Long, s2: Long, id2: Long): Boolean =
      s > s2 || (s == s2 && id < id2)

    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val (s, id) = in
      val n = buf.length / 2
      if (n == k && !beats(s, id, buf(2 * (k - 1)), buf(2 * k - 1))) return buf
      // insertion position among ≤ k sorted pairs
      var p = 0
      while (p < n && !beats(s, id, buf(2 * p), buf(2 * p + 1))) p += 1
      val m = math.min(n + 1, k)
      val out = Array.ofDim[Long](2 * m)
      System.arraycopy(buf, 0, out, 0, 2 * p)
      out(2 * p) = s; out(2 * p + 1) = id
      System.arraycopy(buf, 2 * p, out, 2 * p + 2, 2 * (m - p - 1))
      out
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val na = a.length / 2; val nb = b.length / 2
      val m = math.min(na + nb, k)
      val out = Array.ofDim[Long](2 * m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeA = j >= nb ||
          (i < na && !beats(b(2 * j), b(2 * j + 1), a(2 * i), a(2 * i + 1)))
        if (takeA) { out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1 }
        else { out(2 * o) = b(2 * j); out(2 * o + 1) = b(2 * j + 1); j += 1 }
        o += 1
      }
      out
    }

    override def finish(buf: Array[Long]): Seq[(Long, Long)] =
      (0 until buf.length / 2).map(i => (buf(2 * i), buf(2 * i + 1)))
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Top `k` rows per `groupCols` group by (`scoreCol` DESC, `idCol`
    * ASC). Output: groupCols + (rank, score, id) — rank is 1-based.
    *
    * LONG-ONLY contract: the bounded-heap buffer packs (score, id) as
    * long pairs, so both columns must already be integral (byte/short/
    * int/long). A fractional score would be silently truncated before
    * ranking — order wrong with no error — so non-integral input types
    * are rejected here instead of cast. Fixed-point-quantize fractional
    * scores first (the Pca.moments floor(x·1e9) idiom).
    */
  def perGroup(
      df: DataFrame, groupCols: Seq[String], scoreCol: Column, idCol: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    for ((c, what) <- Seq(scoreCol -> "scoreCol", idCol -> "idCol")) {
      val dt = df.select(c).schema.head.dataType
      require(integral.contains(dt),
        s"TopK.perGroup: $what has type ${dt.simpleString} — the long-packed " +
          "heap would truncate it and rank wrongly; quantize to an integral " +
          "type first (e.g. floor(x * 1e9) fixed point)")
    }
    val agg = udaf(new TopKAggregator(k))
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(scoreCol.cast("long"), idCol.cast("long")).as("__topk"))
      .select((groupCols.map(col) :+
        posexplode(col("__topk")).as(Seq("__pos", "__t"))): _*)
      .select(groupCols.map(col) ++
        Seq((col("__pos") + 1).cast("long").as("rank"),
          col("__t._1").as("score"), col("__t._2").as("id")): _*)
  }
}
