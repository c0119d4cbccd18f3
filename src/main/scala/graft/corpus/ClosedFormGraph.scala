package graft.corpus

import scala.collection.mutable
import graft.model.{CodeFile, Ids}

/**
 * INDEPENDENT serial model of the pipeline's GRAPH-LEVEL outcome on the
 * synthetic corpus — the node/edge/type counts behind `kg_stats`
 * (GraphBuilder.stats, full=false). Extends [[ClosedFormTriples]]'s
 * name-level line-scan to TYPED entities and id-level triples, then
 * replays linking and edge redirection serially:
 *
 *  - extraction: the same independent line scan (no shared code with the
 *    extractor's regex bank), now emitting (name, type) endpoints;
 *  - linking: blocking keys + per-block cap + pair scoring reuse the
 *    SHARED SCALAR kernels (Linker.squash/acronymKey, Similarity.score/
 *    accept — each difflib-parity-tested on its own), while the blocking,
 *    union-find, and redirect around them are plain Scala (the q31
 *    independence compromise: the fixture pins the distributed PLUMBING);
 *  - stats: canonical node counts by type, distinct redirected edge keys
 *    by relType, density — the exact row set `stats(full = false)` unions.
 *
 * Used by FixtureGen, which REFUSES to write the kg_stats fixture unless
 * this model matches the Spark pipeline's stats rows exactly.
 */
object ClosedFormGraph {

  /** Typed fact: (subjName, subjType, relType, objName, objType). */
  final case class Fact(s: String, st: String, r: String, o: String, ot: String)

  /** Independent typed extraction for one generated file (same line rules
    * as [[ClosedFormTriples.expectedTriples]], with entity types attached:
    * path→file, import target→module, class names→class, def/call
    * names→function, rel-comment endpoints→concept).
    */
  def typedFacts(f: CodeFile): Seq[Fact] = {
    val out = mutable.ArrayBuffer.empty[Fact]
    for (raw <- f.content.split("\n")) {
      val line = raw
      val trimmed = line.trim
      if (line.startsWith("import ")) {
        out += Fact(f.path, "file", "imports", line.stripPrefix("import ").trim, "module")
      } else if (trimmed.startsWith("class ") && trimmed.contains(" extends ")) {
        val rest = trimmed.stripPrefix("class ")
        val cls = rest.takeWhile(_.isLetterOrDigit)
        val sup = rest.split(" extends ")(1).takeWhile(c => c.isLetterOrDigit || c == '_')
        out += Fact(cls, "class", "is-a", sup, "class")
        out += Fact(f.path, "file", "declares", cls, "class")
      } else if (trimmed.startsWith("def ") && trimmed.contains("(")) {
        val fn = trimmed.stripPrefix("def ").takeWhile(c => c.isLetterOrDigit || c == '_')
        out += Fact(f.path, "file", "defines", fn, "function")
      } else if (trimmed.startsWith("// rel: ")) {
        val parts = trimmed.stripPrefix("// rel: ").split("\\s+")
        if (parts.length == 3)
          out += Fact(parts(0), "concept", parts(1), parts(2), "concept")
      } else if (line.startsWith(" ") && trimmed.nonEmpty && trimmed.head.isLetter &&
        !trimmed.startsWith("def ") && !trimmed.startsWith("class ")) {
        val name = trimmed.takeWhile(c => c.isLetterOrDigit || c == '_')
        if (name.nonEmpty && trimmed.drop(name.length).startsWith("(")) {
          out += Fact(f.path, "file", "calls", name, "function")
        }
      }
    }
    out.toSeq
  }

  /** The expected `stats(full = false)` row set for an n-file corpus:
    * ("nodes", n), ("edges", e), ("density", e/(n·(n−1))) plus
    * "entity:TYPE" and "rel:TYPE" count rows — doubles computed with the
    * same IEEE ops as the distributed aggregates (counts are exact).
    */
  def expectedStats(n: Long, seed: Long = 42L): Set[(String, Double)] = {
    val nRepos = math.max(8, math.sqrt(n.toDouble).toInt)
    val facts = (0L until n).flatMap(i =>
      typedFacts(CorpusGen.genFile(seed, i, nRepos)))

    // mention universe: (id, name, type); id = sha(lower(name)|type) — one
    // surface spelling per id on this corpus (asserted: a case-variant
    // collision would make the canonical-name choice depend on merge
    // internals this model deliberately does not replicate)
    val ments = mutable.HashMap.empty[String, (String, String)] // id → (name, type)
    def ent(name: String, etype: String): String = {
      val id = Ids.entityId(Ids.normName(name), etype)
      ments.get(id) match {
        case Some((prev, _)) =>
          require(prev == name,
            s"closed-form model assumes one spelling per entity id; got '$prev' vs '$name'")
        case None => ments.update(id, (name, etype))
      }
      id
    }
    val triples = facts.map(f => (ent(f.s, f.st), f.r, ent(f.o, f.ot)))

    // ---- linking replay: blocking → cap(64, id asc) → score/accept →
    //      union-find with UTF-8 min-id labels
    val blocks = mutable.HashMap.empty[(String, String), mutable.TreeMap[String, String]]
    ments.foreach { case (id, (name, etype)) =>
      (Seq(graft.link.Linker.squash(name)) ++ graft.link.Linker.acronymKey(name))
        .distinct.foreach { k =>
          blocks.getOrElseUpdate((k, etype),
            mutable.TreeMap.empty[String, String](graft.runtime.Utf8Order))
            .update(id, name)
        }
    }
    val parent = mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (graft.runtime.Utf8Order.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    blocks.valuesIterator.foreach { members =>
      val kept = members.iterator.take(graft.link.Linker.MaxBlockSize).toArray
      var i = 0
      while (i < kept.length - 1) {
        var j = i + 1
        while (j < kept.length) {
          val (id1, n1) = kept(i); val (id2, n2) = kept(j)
          if (graft.link.Similarity.score(n1, n2) >= graft.link.Linker.DefaultThreshold &&
              graft.link.Similarity.accept(n1, n2)) union(id1, id2)
          j += 1
        }
        i += 1
      }
    }
    def canon(id: String): String =
      if (parent.contains(id)) find(id) else id

    // ---- stats rows
    val canonTypes = ments.keysIterator
      .map(id => canon(id) -> ments(id)._2).toMap // canonical id → type
    val nNodes = canonTypes.size
    val edgeKeys = triples.map { case (s, r, o) => (canon(s), r, canon(o)) }.toSet
    val nEdges = edgeKeys.size
    val nD = nNodes.toDouble
    val eD = nEdges.toDouble
    val density = if (nD > 1) eD / (nD * (nD - 1)) else 0.0
    val byEType = canonTypes.groupBy(_._2).map { case (t, m) =>
      (s"entity:$t", m.size.toDouble) }
    val byRType = edgeKeys.groupBy(_._2).map { case (r, ks) =>
      (s"rel:$r", ks.size.toDouble) }
    (Set(("nodes", nD), ("edges", eD), ("density", density)) ++ byEType ++ byRType)
  }
}
