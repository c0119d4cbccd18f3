package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.CodeFile

/**
 * Deterministic synthetic source-code corpus (FIXTURES.md §1, §4).
 *
 * Every row is a pure function of (seed, i) — no RNG state crosses rows —
 * so `sha256(content)` is identical across runs, partitionings, and
 * parallelism levels (the per-row content-sha invariant the north rule
 * requires us to carry through every stage).
 *
 * Planted, grep-able facts (closed-form expected triple set):
 *  - `import pkg.ModuleK` lines      → (file, imports, pkg.ModuleK)
 *  - `class X extends Y`             → (X, is-a, Y)
 *  - `def fN(...)`                   → (class, defines, fN)
 *  - `fN(...)` call sites            → (class, calls, fN)
 *  - alias triplet planted across files: "KnowledgeGraph" /
 *    "knowledge_graph" / "KG" (entity-linking exercise, mirrors the
 *    reference coref fixture src/knowledge/test_coreference_resolver.py)
 *  - an `is-a` cycle CycleA→CycleB→CycleC→CycleA (verifier V1 exercise,
 *    reference knowledge_verifier.py:184-271)
 *  - a causes/prevents contradictory pair (verifier V3, opposites table
 *    knowledge_verifier.py:320-328)
 *  - skew: repos 0 and 1 are "mega-repos" holding ~30% of all files.
 */
object CorpusGen {

  val Langs: Vector[String] = Vector("scala", "java", "python")

  /** Mix a 64-bit value (splitmix64 finalizer) — cheap, seeded, pure. */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def pick(seed: Long, i: Long, salt: Long, n: Int): Int =
    (((mix(seed ^ mix(i * 31 + salt)) >>> 1) % n).toInt)

  /** Repo assignment with planted skew: ~30% of files land in repos 0-1. */
  def repoOf(seed: Long, i: Long, nRepos: Int): Int = {
    val r = pick(seed, i, 1L, 100)
    if (r < 15) 0
    else if (r < 30) 1
    else 2 + pick(seed, i, 2L, math.max(1, nRepos - 2))
  }

  def genFile(seed: Long, i: Long, nRepos: Int): CodeFile = {
    val repoIdx = repoOf(seed, i, nRepos)
    val repo = f"org/repo-$repoIdx%06d"
    val lang = Langs(pick(seed, i, 3L, Langs.size))
    val pkgN = pick(seed, i, 4L, 40)
    val clsN = pick(seed, i, 5L, 200)
    val supN = pick(seed, i, 6L, 50)
    val nDefs = 1 + pick(seed, i, 7L, 4)
    val nImports = 1 + pick(seed, i, 8L, 5)
    val nCalls = 1 + pick(seed, i, 9L, 6)
    val cls = s"Class$clsN"
    val sup = s"Base$supN"
    val path = s"src/main/$lang/pkg$pkgN/$cls.$lang"

    val sb = new StringBuilder
    sb.append(s"package pkg$pkgN\n")
    var k = 0
    while (k < nImports) {
      val m = pick(seed, i, 100L + k, 120)
      sb.append(s"import lib$m.Module$m\n"); k += 1
    }
    sb.append(s"class $cls extends $sup {\n")
    // alias plant: every 13th file mentions the KnowledgeGraph alias family
    // as a call-site mention (entity-linking exercise; same entity spelled
    // three ways across files, mirroring the reference coref fixtures)
    (i % 13) match {
      case 0 => sb.append("  KnowledgeGraph(0)\n")
      case 5 => sb.append("  knowledge_graph(0)\n")
      case 9 => sb.append("  KG(0)\n")
      case _ => ()
    }
    k = 0
    while (k < nDefs) {
      val f = pick(seed, i, 200L + k, 300)
      sb.append(s"  def fn$f(x: Int): Int = {\n")
      var c = 0
      while (c < nCalls) {
        val g = pick(seed, i, 300L + k * 17 + c, 300)
        sb.append(s"    fn$g(x)\n"); c += 1
      }
      sb.append("    x\n  }\n")
      k += 1
    }
    sb.append("}\n")
    // planted is-a cycle across three dedicated files
    if (i % 101 == 11) sb.append("class CycleA extends CycleB {}\n")
    if (i % 101 == 12) sb.append("class CycleB extends CycleC {}\n")
    if (i % 101 == 13) sb.append("class CycleC extends CycleA {}\n")
    // planted contradictory pair: X causes Y vs X prevents Y
    if (i % 97 == 7) sb.append("// rel: Smoking causes Cancer\n")
    if (i % 97 == 8) sb.append("// rel: Smoking prevents Cancer\n")

    val commit = {
      val h = mix(seed ^ mix(i))
      f"$h%016x" * 2 + f"${mix(h)}%08x".take(8)
    }
    CodeFile(repo, path, commit.take(40), lang, sb.toString)
  }

  /** Distributed generation: spark.range → map, embarrassingly parallel,
    * no shuffle; nRepos scales sub-linearly so mega-repo skew persists at
    * any corpus size.
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[CodeFile] = {
    import spark.implicits._
    val nRepos = math.max(8, math.sqrt(n.toDouble).toInt)
    spark.range(0, n).map(i => genFile(seed, i, nRepos))
  }
}
