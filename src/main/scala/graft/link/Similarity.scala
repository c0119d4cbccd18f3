package graft.link

/**
 * Ratcliff-Obershelp similarity — a faithful port of the scoring the
 * reference uses for coreference blocking
 * (difflib.SequenceMatcher.ratio() at
 * src/knowledge/coreference_resolver.py:274-278, threshold 0.7 at :146).
 *
 * ratio = 2*M / (len(a)+len(b)) where M = total length of matched blocks
 * found by recursive longest-common-substring splitting (CPython difflib
 * semantics without the autojunk heuristic — autojunk only activates for
 * sequences longer than 200 chars, which entity names never are).
 */
object Similarity {

  def longestMatch(a: String, aLo: Int, aHi: Int, b: String, bLo: Int, bHi: Int): (Int, Int, Int) = {
    // b2j: char -> positions in b[bLo, bHi)
    val b2j = new java.util.HashMap[Char, java.util.ArrayList[Int]]()
    var j = bLo
    while (j < bHi) {
      val c = b.charAt(j)
      var l = b2j.get(c)
      if (l == null) { l = new java.util.ArrayList[Int](); b2j.put(c, l) }
      l.add(j)
      j += 1
    }
    var bestI = aLo; var bestJ = bLo; var bestSize = 0
    var j2len = new java.util.HashMap[Int, Int]()
    var i = aLo
    while (i < aHi) {
      val newJ2len = new java.util.HashMap[Int, Int]()
      val js = b2j.get(a.charAt(i))
      if (js != null) {
        val it = js.iterator()
        while (it.hasNext) {
          val jj = it.next()
          val k = j2len.getOrDefault(jj - 1, 0) + 1
          newJ2len.put(jj, k)
          if (k > bestSize) { bestI = i - k + 1; bestJ = jj - k + 1; bestSize = k }
        }
      }
      j2len = newJ2len
      i += 1
    }
    (bestI, bestJ, bestSize)
  }

  private def matchedLen(a: String, aLo: Int, aHi: Int, b: String, bLo: Int, bHi: Int): Int = {
    if (aLo >= aHi || bLo >= bHi) return 0
    val (i, j, k) = longestMatch(a, aLo, aHi, b, bLo, bHi)
    if (k == 0) 0
    else k + matchedLen(a, aLo, i, b, bLo, j) + matchedLen(a, i + k, aHi, b, j + k, bHi)
  }

  def ratio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) 1.0
    else 2.0 * matchedLen(a, 0, a.length, b, 0, b.length) / total
  }

  /** Word split for acronym matching: camelCase, snake_case, kebab, dots. */
  def words(name: String): Seq[String] = {
    val spaced = name
      .replaceAll("([a-z0-9])([A-Z])", "$1 $2")
      .replaceAll("[_\\-./]+", " ")
    spaced.split("\\s+").toIndexedSeq.filter(_.nonEmpty)
  }

  /** "KG" matches initials of "KnowledgeGraph"/"knowledge_graph" — the
    * deterministic stand-in for the reference's LLM alias adjudication
    * (coreference_resolver.py:288-370).
    */
  def isAcronymOf(shortName: String, longName: String): Boolean = {
    val s = shortName.toLowerCase
    val ws = words(longName)
    ws.length >= 2 && s == ws.map(_.charAt(0).toLower).mkString
  }

  /** Pair score used by the linker: max of RO ratio on lowercase names and
    * the acronym rule (1.0 on hit).
    */
  def score(a: String, b: String): Double = {
    val la = a.toLowerCase.trim; val lb = b.toLowerCase.trim
    if (la == lb) 1.0
    else if (isAcronymOf(a, b) || isAcronymOf(b, a)) 1.0
    else ratio(la, lb)
  }

  private def digits(s: String): String = s.filter(_.isDigit)

  /** Deterministic merge adjudication — the stand-in for the reference's
    * LLM merge decision (coreference_resolver.py:288-370). The 0.7 ratio
    * is only the reference's CANDIDATE threshold; accepting every 0.7 pair
    * deterministically over-merges catastrophically (lib7.Module7 vs
    * lib12.Module12 scores ≈0.85). Accept iff:
    *  - names are equal modulo case/separators (squash equality), or
    *  - one is the acronym/initials of the other, or
    *  - RO ratio ≥ strictRatio AND the digit subsequences agree (numeric
    *    suffixes are identity-bearing in code corpora: fn12 ≠ fn13).
    */
  def accept(a: String, b: String, strictRatio: Double = 0.9): Boolean = {
    val sa = a.toLowerCase.replaceAll("[_\\-./\\s]+", "")
    val sb = b.toLowerCase.replaceAll("[_\\-./\\s]+", "")
    if (sa == sb) true
    else if (isAcronymOf(a, b) || isAcronymOf(b, a)) true
    else digits(a) == digits(b) && ratio(a.toLowerCase.trim, b.toLowerCase.trim) >= strictRatio
  }
}
