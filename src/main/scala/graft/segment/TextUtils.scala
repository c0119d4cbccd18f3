package graft.segment

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text utilities T5-T10 + S4 (SURVEY.md §2.2; reference
 * src/utils/text_utils.py and src/text_processing/text_loader.py).
 * Pure functions usable both inside flatMap stages and as columns.
 */
object TextUtils {

  /** S4 text normalization (text_loader.py:206-225, patterns :40-47):
    * collapse runs of spaces/tabs, normalize CRLF, strip zero-width chars.
    * Column form — a regexp_replace chain, fully codegen'd.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(c, "[\\u200b\\u200c\\u200d\\ufeff]", ""),
        "\\r\\n", "\n"),
      "[ \\t]+", " "))

  def normalizeText(s: String): String =
    s.replaceAll("[\\u200b\\u200c\\u200d\\ufeff]", "")
      .replaceAll("\\r\\n", "\n")
      .replaceAll("[ \\t]+", " ")
      .trim

  /** T6 best split point (text_utils.py:186-223): prefer a sentence end,
    * then a word end, within ±window chars of the target position.
    */
  def findBestSplitPoint(text: String, target: Int, window: Int = 100): Int = {
    if (target >= text.length) return text.length
    val lo = math.max(0, target - window)
    val hi = math.min(text.length, target + window)
    val slice = text.substring(lo, hi)
    // sentence ends: . ! ? followed by space
    val sentEnds = raw"[.!?]\s".r.findAllMatchIn(slice).map(lo + _.end).toSeq
    if (sentEnds.nonEmpty) return sentEnds.minBy(p => math.abs(p - target))
    val wordEnds = raw"\s".r.findAllMatchIn(slice).map(lo + _.start).toSeq
    if (wordEnds.nonEmpty) return wordEnds.minBy(p => math.abs(p - target))
    target
  }

  /** T5 greedy paragraph packing into ≤maxChars segments
    * (extract_segments, text_utils.py:129-183): paragraphs are packed
    * greedily; oversized paragraphs split at best split points.
    */
  def packSegments(text: String, maxChars: Int = 1000): Seq[String] = {
    val paras = text.split("\\n\\s*\\n").filter(_.trim.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    for (p <- paras) {
      if (p.length > maxChars) {
        flush()
        var rest = p
        while (rest.length > maxChars) {
          val cut = findBestSplitPoint(rest, maxChars)
          val at = if (cut <= 0 || cut > rest.length) maxChars else cut
          out += rest.substring(0, at).trim
          rest = rest.substring(at)
        }
        if (rest.trim.nonEmpty) cur.append(rest.trim)
      } else if (cur.length + p.length + 2 <= maxChars) {
        if (cur.nonEmpty) cur.append("\n\n")
        cur.append(p)
      } else {
        flush(); cur.append(p)
      }
    }
    flush()
    out.toSeq
  }

  /** T7 markdown strip (strip_markdown, text_utils.py:226-266). */
  def stripMarkdown(s: String): String =
    s.replaceAll("(?m)^#{1,6}\\s+", "")          // headers
      .replaceAll("\\*\\*([^*]*)\\*\\*", "$1")   // bold
      .replaceAll("\\*([^*]*)\\*", "$1")         // italic
      .replaceAll("__([^_]*)__", "$1")
      .replaceAll("_([^_]*)_", "$1")
      .replaceAll("!\\[[^\\]]*\\]\\([^)]*\\)", "") // images
      .replaceAll("\\[([^\\]]*)\\]\\([^)]*\\)", "$1") // links
      .replaceAll("(?s)```.*?```", "")           // code blocks
      .replaceAll("`([^`]*)`", "$1")             // inline code
      .replaceAll("(?m)^>\\s+", "")              // blockquotes
      .replaceAll("(?m)^[-*+]\\s+", "")          // bullets

  def stripMarkdownCol(c: Column): Column = {
    val steps: Seq[Column => Column] = Seq(
      x => regexp_replace(x, "(?m)^#{1,6}\\s+", ""),
      x => regexp_replace(x, "\\*\\*([^*]*)\\*\\*", "$1"),
      x => regexp_replace(x, "\\*([^*]*)\\*", "$1"),
      x => regexp_replace(x, "!\\[[^\\]]*\\]\\([^)]*\\)", ""),
      x => regexp_replace(x, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1"),
      x => regexp_replace(x, "(?s)```.*?```", ""),
      x => regexp_replace(x, "`([^`]*)`", "$1"),
      x => regexp_replace(x, "(?m)^>\\s+", ""),
      x => regexp_replace(x, "(?m)^[-*+]\\s+", ""))
    steps.foldLeft(c)((acc, f) => f(acc))
  }

  /** T9 token estimate: len/4 (count_tokens_approx, text_utils.py:108-126). */
  def countTokensApprox(c: Column): Column = ceil(length(c) / 4)

  /** T10 truncate at word boundary with ellipsis (truncate_text,
    * text_utils.py:79-105).
    */
  def truncateText(s: String, maxLen: Int): String =
    if (s.length <= maxLen) s
    else {
      val cut = s.substring(0, maxLen)
      val lastSpace = cut.lastIndexOf(' ')
      (if (lastSpace > 0) cut.substring(0, lastSpace) else cut) + "..."
    }
}
