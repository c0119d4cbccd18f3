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
    // preserving over code points) without allocating byte arrays per call.
    // UNPAIRED surrogates: Spark's UTF8String.fromString goes through
    // String.getBytes(UTF_8), which substitutes '?' (0x3F) for a lone
    // surrogate, while codePointAt returns the raw D800–DFFF value — map
    // them to 0x3F here so malformed ids sort exactly as Spark sorts them
    // (charCount still advances by the RAW code point: 1 for a lone
    // surrogate, 2 for a valid pair).
    val la = a.length
    val lb = b.length
    var i = 0
    var j = 0
    while (i < la && j < lb) {
      val ra = a.codePointAt(i)
      val rb = b.codePointAt(j)
      val ca = if (ra >= 0xD800 && ra <= 0xDFFF) 0x3F else ra
      val cb = if (rb >= 0xD800 && rb <= 0xDFFF) 0x3F else rb
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ra)
      j += Character.charCount(rb)
    }
    Integer.compare(la - i, lb - j)
  }

  override def lt(a: String, b: String): Boolean = compare(a, b) < 0
}
