package graft.segment

import org.apache.spark.sql.Dataset
import graft.model.{CodeFile, Ids, Segment}

/**
 * Catalyst-native segmentation stage: one typed `flatMap` per file row —
 * narrow (no shuffle), embarrassingly parallel, codegen-friendly input
 * scan. Two modes, mirroring the reference's segmentation semantics:
 *
 *  - code files → fixed-size overlapping line windows (the deterministic
 *    replacement for the reference's LLM segmenter, SURVEY.md §2.2 T1/T3:
 *    "for code corpus: line-aware windowing — fixed-size overlapping
 *    windows of N lines with K overlap, deterministic")
 *  - natural-language text → paragraph split on \n\s*\n with exact char
 *    positions (reference `_segment_with_rules`,
 *    src/text_processing/text_segmenter.py:330-435), long paragraphs
 *    further split on sentence boundaries `(?<=[.!?])\s+`
 *    (text_segmenter.py:387-390, threshold 200 chars).
 *
 * Every segment carries its parent file's `contentSha` — the per-row
 * sha256 invariant (north rule) — plus exact [start, end) char offsets so
 * any segment can be audited byte-for-byte against the input.
 */
object CodeSegmenter {

  val WindowLines = 40
  val OverlapLines = 8
  val LongParagraph = 200

  private val NlLangs = Set("en", "ru", "de", "fr", "es", "zh")

  def segmentFile(f: CodeFile): Seq[Segment] = {
    val sha = Ids.contentSha(f.content)
    val fileSegId = Ids.fileSegId(f.repo, f.path, f.commit)
    val root = Segment(
      segId = fileSegId, parentId = None, repo = f.repo, path = f.path,
      lang = f.lang, level = 0, segType = "file", title = Some(f.path),
      text = f.content, start = 0L, end = f.content.length.toLong, contentSha = sha)
    val children =
      if (NlLangs.contains(f.lang)) paragraphs(f, sha, fileSegId)
      else lineWindows(f, sha, fileSegId)
    root +: children
  }

  /** Overlapping line windows with exact char offsets. */
  private def lineWindows(f: CodeFile, sha: String, parent: String): Seq[Segment] = {
    val content = f.content
    // line start offsets
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = content.indexOf('\n')
    while (i >= 0 && i < content.length - 1) { starts += i + 1; i = content.indexOf('\n', i + 1) }
    val nLines = starts.length
    val step = WindowLines - OverlapLines
    val out = scala.collection.mutable.ArrayBuffer.empty[Segment]
    var line0 = 0
    var done = false
    while (!done) {
      val lineEnd = math.min(line0 + WindowLines, nLines)
      val cStart = starts(line0).toLong
      val cEnd = if (lineEnd >= nLines) content.length.toLong else starts(lineEnd).toLong
      out += Segment(
        segId = Ids.segId(f.repo, f.path, f.commit, cStart, cEnd),
        parentId = Some(parent), repo = f.repo, path = f.path, lang = f.lang,
        level = 1, segType = "window", title = None,
        text = content.substring(cStart.toInt, cEnd.toInt),
        start = cStart, end = cEnd, contentSha = sha)
      if (lineEnd >= nLines) done = true else line0 += step
    }
    out.toSeq
  }

  private val ParaSplit = "\\n\\s*\\n".r
  private val SentSplit = "(?<=[.!?])\\s+".r
  private val HeaderLine = "(?m)^#{1,6}[ \\t].*$".r

  /** NL segmentation (text_segmenter.py:330-435 rules): markdown-header
    * SECTIONS (when present) → paragraphs → sentences-for-long-paragraphs.
    * The section level is the deterministic stand-in for the reference
    * LLM segmenter's section structure (segmentation prompt levels 1-2;
    * the committed segments.json example nests paragraphs under a
    * "# ..."-titled section) — header depth is not nested further, every
    * `#`..`######` heading opens one section running to the next heading.
    */
  private def paragraphs(f: CodeFile, sha: String, parent: String): Seq[Segment] = {
    val content = f.content
    val headers = HeaderLine.findAllMatchIn(content).toVector
    if (headers.isEmpty) paragraphBlocks(f, sha, parent, 0, content.length, 1)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Segment]
      // preamble before the first heading: plain paragraphs under the root
      if (headers.head.start > 0)
        out ++= paragraphBlocks(f, sha, parent, 0, headers.head.start, 1)
      for (idx <- headers.indices) {
        val h = headers(idx)
        val secStart = h.start
        val secEnd = if (idx + 1 < headers.size) headers(idx + 1).start else content.length
        val title = content.substring(h.start, h.end).dropWhile(_ == '#').trim
        val secId = Ids.sectionSegId(f.repo, f.path, f.commit, secStart.toLong, secEnd.toLong)
        out += Segment(secId, Some(parent), f.repo, f.path, f.lang, 1, "section",
          Some(title), content.substring(secStart, secEnd),
          secStart.toLong, secEnd.toLong, sha)
        // children cover the WHOLE section span including the heading
        // line: the heading becomes (part of) the first paragraph child,
        // so the leaf-only extraction surface still sees every character
        // — mentions in headings ('# Acme Corp') must not vanish when the
        // container level is excluded from windows()
        out ++= paragraphBlocks(f, sha, secId, secStart, secEnd, 2)
      }
      out.toSeq
    }
  }

  /** Paragraph/sentence blocks of content[from, to) with exact global char
    * offsets; paragraphs at `level`, sentence splits of long paragraphs at
    * `level + 1`.
    */
  private def paragraphBlocks(f: CodeFile, sha: String, parent: String,
                              from: Int, to: Int, level: Int): Seq[Segment] = {
    val content = f.content
    val range = content.substring(from, to)
    val out = scala.collection.mutable.ArrayBuffer.empty[Segment]
    var pos = 0
    val matches = ParaSplit.findAllMatchIn(range).toVector
    val bounds = (matches.map(m => (m.start, m.end)) :+ ((range.length, range.length)))
    for ((bStart, bEnd) <- bounds) {
      if (bStart > pos) {
        val para = range.substring(pos, bStart)
        if (para.trim.nonEmpty) {
          if (para.length > LongParagraph) {
            // sentence-split long paragraphs, preserving offsets
            var sPos = 0
            val sm = SentSplit.findAllMatchIn(para).toVector
            val sBounds = sm.map(m => (m.start, m.end)) :+ ((para.length, para.length))
            for ((sbS, sbE) <- sBounds) {
              if (sbS > sPos) {
                val s0 = from + pos + sPos; val s1 = from + pos + sbS
                out += Segment(Ids.segId(f.repo, f.path, f.commit, s0.toLong, s1.toLong),
                  Some(parent), f.repo, f.path, f.lang, level + 1, "sentence", None,
                  content.substring(s0, s1), s0.toLong, s1.toLong, sha)
              }
              sPos = sbE
            }
          } else {
            val p0 = from + pos; val p1 = from + bStart
            out += Segment(Ids.segId(f.repo, f.path, f.commit, p0.toLong, p1.toLong),
              Some(parent), f.repo, f.path, f.lang, level, "paragraph", None,
              para, p0.toLong, p1.toLong, sha)
          }
        }
      }
      pos = bEnd
    }
    out.toSeq
  }

  def segment(files: Dataset[CodeFile]): Dataset[Segment] = {
    import files.sparkSession.implicits._
    files.flatMap(segmentFile _)
  }

  /** Windows only (level>0): the extraction stage input — excludes the
    * level-0 file rows so mentions aren't double-counted.
    */
  /** LEAF segments only — the extraction surface. Containers (the level-0
    * file root and markdown sections) hold the same characters their
    * children hold; extracting from both would double every mention.
    */
  def windows(files: Dataset[CodeFile]): Dataset[Segment] = {
    import files.sparkSession.implicits._
    files.flatMap(f => segmentFile(f).filter(s =>
      s.level > 0 && s.segType != "section"))
  }
}
