package graft.model

/**
 * Core record types of the knowledge-graph construction engine.
 *
 * Modeled on the reference's dataclasses (see /root/reference/):
 *  - Segment:      src/text_processing/segment.py:14-28
 *  - Entity:       src/knowledge/entity.py:14-28
 *  - Relationship: src/knowledge/relationship.py:16-33
 *  - VerificationIssue: src/knowledge/knowledge_verifier.py:30-64
 *
 * Divergences (deliberate, per SURVEY.md §1.3): the reference assigns
 * uuid4 ids at creation; we derive ids from content (sha-based) so every
 * stage is idempotent, resumable, and reproducible across parallelism
 * levels. `attributes` is Map[String,String] with JSON-encoded values to
 * preserve the reference's "scalar→list on merge conflict" semantics
 * (entity.py:66-72) losslessly.
 */

/** One row of the input corpus (BASELINE.json input_hint shape). */
final case class CodeFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** A windowed chunk of one file (the segmentation stage output).
  * `contentSha` carries the per-row sha256 invariant of the parent file.
  */
final case class Segment(
    segId: String,
    parentId: Option[String],
    repo: String,
    path: String,
    lang: String,
    level: Int,
    segType: String,
    title: Option[String],
    text: String,
    start: Long,
    end: Long,
    contentSha: String
)

/** A detected entity mention / merged canonical entity.
  * Mirrors reference Entity (entity.py:14-37): confidence ∈ [0,1].
  */
final case class Entity(
    id: String,
    name: String,
    entityType: String,
    context: Option[String],
    attributes: Map[String, String],
    confidence: Double,
    segId: String,
    repo: String,
    path: String,
    contentSha: String
)

/** A (subj, pred, obj) edge. Mirrors reference Relationship
  * (relationship.py:16-46): strength/confidence ∈ [0,1].
  */
final case class Triple(
    id: String,
    srcId: String,
    dstId: String,
    srcName: String,
    dstName: String,
    relType: String,
    context: Option[String],
    bidirectional: Boolean,
    strength: Double,
    confidence: Double,
    segId: String,
    attributes: Map[String, String] = Map.empty
)

/** Verification issue (knowledge_verifier.py:30-64). Severity is one of
  * {critical, medium, low}; a graph is valid iff no critical issues
  * (knowledge_verifier.py:78-82).
  */
final case class Issue(
    issueType: String,
    involvedElements: Seq[String],
    proposedSolution: String,
    severity: String
)

object Severity {
  val Critical = "critical"
  val Medium = "medium"
  val Low = "low"
}

/** Deterministic ids (SURVEY.md §1.3).
  *
  * Hot path: every mention and triple gets an id, so this runs millions of
  * times per partition — thread-local digest instances (getInstance
  * allocates) and table-driven hex (String.format per byte compiles a
  * Formatter regex each call — measured 10x+ pipeline slowdown).
  */
object Ids {
  private val hexChars = "0123456789abcdef".toCharArray
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xff
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 0x0f)
      i += 1
    }
    new String(out)
  }

  def sha256Hex(s: String): String = {
    val md = digests.get()
    md.reset()
    hex(md.digest(s.getBytes("UTF-8")))
  }
  def contentSha(content: String): String = sha256Hex(content)
  def segId(repo: String, path: String, commit: String, start: Long, end: Long): String =
    sha256Hex(s"$repo|$path|$commit|$start|$end").take(32)
  /** The level-0 file segment gets its OWN derivation: a file short enough
    * for a single window would otherwise give the window child the same
    * (start, end) span — and therefore the same id — as its parent,
    * turning the segment hierarchy into a self-loop.
    */
  def fileSegId(repo: String, path: String, commit: String): String =
    sha256Hex(s"$repo|$path|$commit|file").take(32)
  /** Sections likewise (a heading-only section spans exactly its single
    * paragraph child — same (start, end), so span-derived ids would
    * collide container with child).
    */
  def sectionSegId(repo: String, path: String, commit: String, start: Long, end: Long): String =
    sha256Hex(s"$repo|$path|$commit|section|$start|$end").take(32)
  def entityId(normName: String, entityType: String): String =
    sha256Hex(s"$normName|$entityType").take(32)
  def tripleId(srcId: String, relType: String, dstId: String, segId: String): String =
    sha256Hex(s"$srcId|$relType|$dstId|$segId").take(32)
  /** Reference name normalization: lower().strip() (entity.py:354-366). */
  def normName(name: String): String = name.toLowerCase.trim
}
