package graft.fixtures

/** Independent plain-Scala XXH64 (Yann Collet's public xxHash spec,
  * https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) used to
  * compute oracle fingerprints for q44b without touching Spark's
  * `xxhash64` expression — a second implementation of the same public
  * algorithm, so an engine-side hashing bug can't self-confirm.
  *
  * Layout conventions match the spec (and therefore Spark's port): all
  * multi-byte reads are little-endian; strings hash their UTF-8 bytes; a
  * bare long hashes as a single 8-byte lane.
  */
object XxHash64Ref {

  private val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  private val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  private val P3 = 1609587929392839161L  // 0x165667B19E3779F9
  private val P4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
  private val P5 = 2870177450012600261L  // 0x27D4EB2F165667C5

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  private def le64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | (b(i + 1) & 0xffL) << 8 | (b(i + 2) & 0xffL) << 16 |
      (b(i + 3) & 0xffL) << 24 | (b(i + 4) & 0xffL) << 32 | (b(i + 5) & 0xffL) << 40 |
      (b(i + 6) & 0xffL) << 48 | (b(i + 7) & 0xffL) << 56

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | (b(i + 1) & 0xffL) << 8 | (b(i + 2) & 0xffL) << 16 |
      (b(i + 3) & 0xffL) << 24

  @inline private def round(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  /** XXH64 of a byte array. */
  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var idx = 0
    var hash =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (idx + 32 <= len) {
          v1 = round(v1, le64(bytes, idx))
          v2 = round(v2, le64(bytes, idx + 8))
          v3 = round(v3, le64(bytes, idx + 16))
          v4 = round(v4, le64(bytes, idx + 24))
          idx += 32
        }
        var h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        for (v <- Seq(v1, v2, v3, v4)) { h ^= round(0L, v); h = h * P1 + P4 }
        h
      } else seed + P5
    hash += len
    while (idx + 8 <= len) {
      hash ^= round(0L, le64(bytes, idx))
      hash = rotl(hash, 27) * P1 + P4
      idx += 8
    }
    if (idx + 4 <= len) {
      hash ^= le32(bytes, idx) * P1
      hash = rotl(hash, 23) * P2 + P3
      idx += 4
    }
    while (idx < len) {
      hash ^= (bytes(idx) & 0xffL) * P5
      hash = rotl(hash, 11) * P1
      idx += 1
    }
    avalanche(hash)
  }

  /** XXH64 of one long (a single 8-byte lane, per the spec's tail rules). */
  def hashLong(input: Long, seed: Long): Long = {
    var hash = seed + P5 + 8L
    hash ^= round(0L, input)
    hash = rotl(hash, 27) * P1 + P4
    avalanche(hash)
  }

  /** `xxhash64(acc, tok)` as the engine composes it: the 42 default seed,
    * the long lane first, then the token's UTF-8 bytes. */
  def chain(acc: Long, tok: String): Long =
    hashBytes(tok.getBytes("UTF-8"), hashLong(acc, 42L))

  /** The q44b document fingerprint: order-sensitive left fold over
    * whitespace tokens, zero-seeded — mirrors TextFunctions.fingerprint. */
  def fingerprint(text: String): Long =
    text.split(" ", -1).filter(_.nonEmpty).foldLeft(0L)(chain)
}
