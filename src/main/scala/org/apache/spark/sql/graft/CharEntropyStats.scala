package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-distribution statistics in one row-local pass:
  * `struct(n_chars, n_distinct, entropy)` over the string's CODEPOINTS
  * (UTF-8 decoded, so multi-byte scripts count per character, not per
  * byte).
  *
  * Character Shannon entropy is the classic cheap gibberish/boilerplate
  * signal (a low-entropy document is a repeated character or tiny
  * alphabet — key-mash, ASCII art, pad tokens): the declarative spelling
  * explodes the text into one row PER CHARACTER and double-aggregates
  * (groupBy(doc, char) then groupBy(doc)) — two full-corpus shuffles of
  * a stream ~100x wider than the documents themselves, for a statistic
  * that never leaves the row. This expression computes the histogram in
  * one byte walk per document, leaving only the final per-language
  * rollup on the wire (the [[WordNgramStats]] argument, one level down).
  *
  * entropy = log2(n) - Σ c_i·log2(c_i) / n  — the algebraically
  * rearranged −Σ p·log2 p, which (a) needs no per-term division and
  * (b) is EXACTLY zero for single-character strings regardless of the
  * log implementation (the two terms cancel), so the degenerate cohort
  * can never straddle a band boundary. Callers snap the double to a
  * decimal grid before comparing across engines (SURVEY §2.14).
  */
case class CharEntropyStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  private val Ln2 = math.log(2.0)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return InternalRow(0L, 0L, 0.0)
    // codepoint histogram in one byte walk: UTF-8 lead byte determines
    // the encoded width; continuation bytes all have the high bits 10,
    // so decoding by width is exact on well-formed input. Malformed
    // input (stray continuation byte, truncated or broken multi-byte
    // sequence — possible when the column is a binary cast, never from
    // a real string) counts ONE U+FFFD per bogus byte and resynchronizes
    // at the next byte: deterministic, and identical to the well-formed
    // walk wherever the input is well-formed.
    val counts = new java.util.HashMap[Int, Long]()
    var n = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) {
        counts.merge(b, 1L, (a, b2) => a + b2)
        i += 1
      } else if (b < 0xc0) { // continuation byte in lead position
        counts.merge(0xfffd, 1L, (a, b2) => a + b2)
        i += 1
      } else {
        val width = if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4
        var ok = i + width <= bytes.length
        var j = 1
        while (ok && j < width) {
          if ((bytes(i + j) & 0xc0) != 0x80) ok = false
          j += 1
        }
        if (!ok) { // truncated tail or non-continuation byte inside
          counts.merge(0xfffd, 1L, (a, b2) => a + b2)
          i += 1
        } else {
          var cp = b & (if (width == 2) 0x1f else if (width == 3) 0x0f else 0x07)
          var k = 1
          while (k < width) {
            cp = (cp << 6) | (bytes(i + k) & 0x3f)
            k += 1
          }
          counts.merge(cp, 1L, (a, b2) => a + b2)
          i += width
        }
      }
      n += 1
    }
    // Σ c·log2(c): iteration order only perturbs the sum at the ulp
    // level, which the caller's decimal snap absorbs (same posture as
    // every float aggregate in the registry)
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * (math.log(c) / Ln2)
    }
    val h = math.log(n.toDouble) / Ln2 - acc / n
    InternalRow(n, counts.size.toLong, if (h < 0.0) 0.0 else h)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
