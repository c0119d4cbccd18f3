package graft.runtime

/**
 * UTF-8 binary string ordering — the order Spark uses for string
 * comparison/sort (UTF8String compares unsigned bytes of the UTF-8
 * encoding). Java's `String.compareTo` orders by UTF-16 code units, which
 * DIVERGES for supplementary code points (encoded as surrogate pairs
 * D800–DFFF) compared against chars in U+E000–U+FFFF: UTF-16 sorts the
 * surrogate lower, UTF-8 sorts the supplementary code point higher.
 *
 * Every driver fast path that must stay bit-identical to its distributed
 * twin (findPath result sort, union-find min-id component labels, the
 * linker's per-block id-order cap) compares through this object instead of
 * `compareTo` (round-5 advice: parity specs only covered ASCII ids).
 */
object Utf8Order extends Ordering[String] {

  def compare(a: String, b: String): Int = {
    // codePoint comparison ≡ UTF-8 byte comparison (UTF-8 is order-
    // preserving over code points) without allocating byte arrays per call
    val la = a.length
    val lb = b.length
    var i = 0
    var j = 0
    while (i < la && j < lb) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(la - i, lb - j)
  }

  override def lt(a: String, b: String): Boolean = compare(a, b) < 0

  def minOf(a: String, b: String): String = if (compare(a, b) <= 0) a else b
}
