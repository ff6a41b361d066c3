package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed substring fingerprints of a document, in one pass: the
  * distinct set of { min over each `stride`-wide window of consecutive
  * k-gram xxhash64 values }, k = minLen - stride + 1 — the discovery
  * selection of SubstringDedup's strided mode (Schleimer/Wilkerson/
  * Aiken, SIGMOD'03).
  *
  * The HOF spelling
  * `array_distinct(transform(sequence(...), i -> array_min(slice(hs, i, stride))))`
  * copies a `stride`-element slice per position — O(chars * stride)
  * allocation and per-element lambda dispatch. This expression walks
  * the codepoints once (CharShingles' offset trick, UTF-8 correct),
  * hashes each k-gram in place with the same XXH64/seed-42 Spark's
  * `xxhash64` uses, and takes the sliding-window minimum with a
  * monotone deque — O(chars) total, emitting values only (window min
  * ties are value-identical, so deque tie policy cannot change the
  * output). Dedup is first-occurrence order, matching array_distinct.
  *
  * One interpreted call per ROW doing the whole loop in JVM code —
  * the CharShingles CodegenFallback argument applies unchanged.
  */
case class WinnowedFingerprints(child: Expression, minLen: Int, stride: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(stride >= 2, s"stride must be >= 2, got $stride")
  require(minLen - stride + 1 >= 4, s"gram length ${minLen - stride + 1} too short")

  private val k = minLen - stride + 1

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // byte offset of every codepoint start (+ end sentinel)
    var count = 0
    var i = 0
    val offsets = new Array[Int](bytes.length + 1)
    while (i < bytes.length) {
      offsets(count) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      count += 1
    }
    offsets(count) = bytes.length
    if (count < minLen) return new GenericArrayData(Array.empty[Any])
    val numH = count - k + 1
    // k-gram hashes: identical to xxhash64(substring(s, p, k)) — XXH64
    // over the slice's bytes with Spark's fixed seed 42
    val hs = new Array[Long](numH)
    var p = 0
    while (p < numH) {
      val start = offsets(p)
      hs(p) = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, offsets(p + k) - start, 42L)
      p += 1
    }
    // sliding min over `stride` consecutive hashes via monotone deque of
    // indices (values non-decreasing head -> tail)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](numH)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    while (j < numH) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - stride) head += 1
      if (j >= stride - 1) seen.add(hs(dq(head)))
      j += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
