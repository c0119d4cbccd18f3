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

  /** Paragraph segmentation with running char offsets (text_segmenter.py:330-435). */
  private def paragraphs(f: CodeFile, sha: String, parent: String): Seq[Segment] = {
    val content = f.content
    val out = scala.collection.mutable.ArrayBuffer.empty[Segment]
    var pos = 0
    val matches = ParaSplit.findAllMatchIn(content).toVector
    val bounds = (matches.map(m => (m.start, m.end)) :+ ((content.length, content.length)))
    for ((bStart, bEnd) <- bounds) {
      if (bStart > pos) {
        val para = content.substring(pos, bStart)
        if (para.trim.nonEmpty) {
          if (para.length > LongParagraph) {
            // sentence-split long paragraphs, preserving offsets
            var sPos = 0
            val sm = SentSplit.findAllMatchIn(para).toVector
            val sBounds = sm.map(m => (m.start, m.end)) :+ ((para.length, para.length))
            for ((sbS, sbE) <- sBounds) {
              if (sbS > sPos) {
                val s0 = pos + sPos; val s1 = pos + sbS
                out += Segment(Ids.segId(f.repo, f.path, f.commit, s0.toLong, s1.toLong),
                  Some(parent), f.repo, f.path, f.lang, 2, "sentence", None,
                  content.substring(s0, s1), s0.toLong, s1.toLong, sha)
              }
              sPos = sbE
            }
          } else {
            out += Segment(Ids.segId(f.repo, f.path, f.commit, pos.toLong, bStart.toLong),
              Some(parent), f.repo, f.path, f.lang, 1, "paragraph", None,
              para, pos.toLong, bStart.toLong, sha)
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
  def windows(files: Dataset[CodeFile]): Dataset[Segment] = {
    import files.sparkSession.implicits._
    files.flatMap(f => segmentFile(f).filter(_.level > 0))
  }
}
