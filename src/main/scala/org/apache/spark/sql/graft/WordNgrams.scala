package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared one-pass space tokenizer for the word-n-gram expressions.
  *
  * Semantics pinned to the declarative reference spelling
  * `filter(split(text, " "), t -> t <> "")` (and the oracle's
  * `list_filter(string_split(text, ' '), x -> x <> '')`): split on the
  * single ASCII space, drop empty tokens. Scanning raw UTF-8 bytes for
  * 0x20 is exact — UTF-8 continuation bytes all have the high bit set,
  * so a space byte can never occur inside a multi-byte codepoint.
  */
private[graft] object SpaceTokens {
  /** (start, end) byte offsets of each non-empty token. */
  def offsets(bytes: Array[Byte]): Array[Int] = {
    // worst case: alternating char/space -> bytes.length/2 tokens
    val out = new Array[Int](bytes.length + 2)
    var k = 0
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && bytes(i) == ' ') i += 1
      if (i < bytes.length) {
        out(k) = i
        while (i < bytes.length && bytes(i) != ' ') i += 1
        out(k + 1) = i
        k += 2
      }
    }
    java.util.Arrays.copyOf(out, k)
  }

  /** The n-gram covering tokens [t, t+n): tokens joined by ONE space.
    * Built in a single allocation; the source may have had runs of
    * spaces between the tokens, so this is not always a contiguous
    * slice of the input.
    */
  def gram(bytes: Array[Byte], off: Array[Int], t: Int, n: Int): UTF8String = {
    var len = n - 1 // separators
    var j = 0
    while (j < n) { len += off(2 * (t + j) + 1) - off(2 * (t + j)); j += 1 }
    val out = new Array[Byte](len)
    var p = 0
    j = 0
    while (j < n) {
      if (j > 0) { out(p) = ' '; p += 1 }
      val s = off(2 * (t + j)); val e = off(2 * (t + j) + 1)
      System.arraycopy(bytes, s, out, p, e - s)
      p += e - s
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** All word n-grams of a string, in one pass (WITH multiplicity, sliding
  * window order — exactly the rows the declarative spelling
  * `transform(sequence(1, size(ts)-n+1), i -> concat_ws(" ", slice(ts, i, n)))`
  * produces).
  *
  * That spelling is CodegenFallback with per-element lambda dispatch, and
  * `slice` copies a fresh n-element array per position — the same
  * interpreted-HOF cost profile that made the character-shingle transform
  * the near-dup family's dominant cost (see [[CharShingles]]). This
  * expression walks the bytes once: token boundaries in one scan, then one
  * exact-size allocation per gram. One interpreted call per ROW doing the
  * whole loop in JVM code, so its own CodegenFallback costs nothing
  * measurable.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val off = SpaceTokens.offsets(bytes)
    val nTok = off.length / 2
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val grams = new Array[AnyRef](nTok - n + 1)
    var t = 0
    while (t + n <= nTok) {
      grams(t) = SpaceTokens.gram(bytes, off, t, n)
      t += 1
    }
    new GenericArrayData(grams)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document word-n-gram repetition statistics in one row-local pass:
  * `struct(n_grams, n_distinct, max_count)` over the document's sliding
  * word n-grams.
  *
  * This exists because the repetition quality signals (Gopher-style
  * duplicate-n-gram fraction, top-n-gram share) are PER-DOCUMENT
  * statistics: the explode + groupBy(doc, gram) + groupBy(doc) spelling
  * shuffles every gram occurrence twice just to count multiplicities that
  * never leave the row. At 100 TB that is two full-corpus shuffles versus
  * a narrow map — this expression makes the whole signal computation
  * row-local, leaving only the final per-language rollup on the wire.
  * The declarative spelling remains the cross-checked reference
  * (DataHygieneSpec) and the DuckDB oracle recomputes it independently.
  */
case class WordNgramStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val off = SpaceTokens.offsets(bytes)
    val nTok = off.length / 2
    if (nTok < n) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[UTF8String, Int]()
    var t = 0
    var mx = 0
    while (t + n <= nTok) {
      val g = SpaceTokens.gram(bytes, off, t, n)
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > mx) mx = c
      t += 1
    }
    InternalRow((nTok - n + 1).toLong, counts.size.toLong, mx.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
