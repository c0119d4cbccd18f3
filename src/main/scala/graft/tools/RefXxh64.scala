package graft.tools

/**
 * Independent XXH64 reference implementation, written directly from the
 * public xxHash specification (Yann Collet, github.com/Cyan4973/xxHash,
 * BSD-2) — deliberately NOT calling Spark's `XxHash64` expression or its
 * `XXH64` helper, so the q30 fingerprint oracle fixture is produced by a
 * second, independent implementation of the hash rather than by the code
 * under test. Parity with Spark's `xxhash64(...)` is pinned by a fuzz
 * test (OpsSpec) and re-asserted by FixtureGen before a fixture is
 * written.
 *
 * Only the two shapes the fingerprint chain needs are implemented:
 * an 8-byte long and a byte array, each with an explicit seed, chained
 * exactly like Spark's multi-argument `xxhash64(acc, token)` (each
 * argument's hash seeds the next; the expression's own seed is 42).
 */
object RefXxh64 {
  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^= h >>> 32
    h
  }

  private def round(acc: Long, k: Long): Long =
    rotl(acc + k * P2, 31) * P1

  def hashLong(input: Long, seed: Long): Long = {
    var h = seed + P5 + 8L
    h ^= rotl(input * P2, 31) * P1
    h = rotl(h, 27) * P1 + P4
    fmix(h)
  }

  private def getLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  private def getIntLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var off = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (off <= len - 32) {
          v1 = round(v1, getLongLE(bytes, off))
          v2 = round(v2, getLongLE(bytes, off + 8))
          v3 = round(v3, getLongLE(bytes, off + 16))
          v4 = round(v4, getLongLE(bytes, off + 24))
          off += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = (acc ^ round(0L, v1)) * P1 + P4
        acc = (acc ^ round(0L, v2)) * P1 + P4
        acc = (acc ^ round(0L, v3)) * P1 + P4
        (acc ^ round(0L, v4)) * P1 + P4
      } else seed + P5
    h += len
    while (off <= len - 8) {
      h ^= round(0L, getLongLE(bytes, off))
      h = rotl(h, 27) * P1 + P4
      off += 8
    }
    if (off <= len - 4) {
      h ^= getIntLE(bytes, off) * P1
      h = rotl(h, 23) * P2 + P3
      off += 4
    }
    while (off < len) {
      h ^= (bytes(off) & 0xffL) * P5
      h = rotl(h, 11) * P1
      off += 1
    }
    fmix(h)
  }

  /** One chain step of the document fingerprint: Spark's two-argument
    * `xxhash64(acc, token)` = the token's bytes hashed with the hash of
    * the accumulator as seed, the whole expression seeded at 42.
    */
  def chainStep(acc: Long, token: String): Long =
    hashBytes(token.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      hashLong(acc, 42L))

  /** Full reference fingerprint: whitespace tokenization with Spark's
    * `split(text, "\\s+")` semantics (Java regex, limit -1 — empty
    * leading/trailing fields kept) folded through [[chainStep]] from
    * [[graft.ops.TextAnalysis.FingerprintSeed]].
    */
  def fingerprint(text: String): Long =
    text.split("\\s+", -1)
      .foldLeft(graft.ops.TextAnalysis.FingerprintSeed)(chainStep)
}
