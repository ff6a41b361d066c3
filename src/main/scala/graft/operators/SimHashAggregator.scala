package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Fused SimHash bit-majority aggregate: buffer = one primitive Int[64]
  * of signed counters, +1/-1 per token bit, packed to the (lo, hi)
  * 32-bit signature halves in finish.
  *
  * Replaces the posexplode formulation (64 rows per token through a
  * (doc_id, pos) aggregation) with one compact buffer per doc: the
  * 64-way explode shuffle and the second aggregation disappear, and the
  * counter update is a tight JVM loop over the 16 hex nibbles — the
  * same fusion that made MinHashAggregator (A8) beat its expression
  * form. Partial-aggregation friendly like any typed Aggregator.
  *
  * Input is the first 16 hex chars of md5(token) computed by the
  * codegen'd md5 expression; the bit definition matches SimHash.bitRows
  * exactly (nibble n holds bits 4n..4n+3, most-significant bit first;
  * bit b of the signature is 1 iff the counter is >= 0), so both
  * formulations produce identical (lo, hi) and the DuckDB oracle is
  * unchanged.
  */
final class SimHashAggregator extends Aggregator[String, Array[Int], Array[Long]] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], hex16: String): Array[Int] = {
    var c = 0
    while (c < 16) {
      val d = Character.digit(hex16.charAt(c), 16)
      var j = 0
      while (j < 4) {
        buf(c * 4 + j) += (((d >> (3 - j)) & 1) << 1) - 1
        j += 1
      }
      c += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Array[Long] = {
    var lo = 0L
    var hi = 0L
    var i = 0
    while (i < 32) {
      if (buf(i) >= 0) lo |= 1L << i
      if (buf(i + 32) >= 0) hi |= 1L << i
      i += 1
    }
    Array(lo, hi)
  }

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
