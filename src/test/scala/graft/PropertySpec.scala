package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.link.{EntityMerge, Similarity}
import graft.model.Entity

/** ScalaCheck properties (SURVEY.md §5): the entity-merge Aggregator must
  * be commutative and associative (required for Spark partial aggregation
  * to be deterministic under ANY partitioning — §7.4 risk 1), and the
  * similarity port must behave like a metric-ish ratio.
  * (scalatestplus bridge unavailable offline → manual deterministic
  * sampling of the generators.)
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    samples(g).foreach(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2).reverse).foreach { case (a, b) => f(a, b) }
  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    samples(g1).lazyZip(samples(g2).reverse).lazyZip(
      samples(g3).drop(7) ++ samples(g3).take(7)).foreach(f)

  private val genEntity: Gen[Entity] = for {
    name <- Gen.oneOf("Alice", "alice ", "ALICE", "Bob", "KnowledgeGraph", "kg")
    conf <- Gen.choose(0.0, 1.0)
    id <- Gen.oneOf("id1", "id2", "id3")
    seg <- Gen.oneOf("s1", "s2")
    ctx <- Gen.option(Gen.oneOf("ctx a", "ctx b"))
    attrs <- Gen.mapOf(Gen.zip(Gen.oneOf("k1", "k2"), Gen.oneOf("v1", "v2")))
  } yield Entity(id, name, "t", ctx, attrs, math.rint(conf * 100) / 100, seg, "", "", "")

  test("merge2 is commutative") {
    forAll(genEntity, genEntity) { (a, b) =>
      assert(EntityMerge.merge2(a, b) == EntityMerge.merge2(b, a))
    }
  }

  test("merge2 is associative") {
    forAll(genEntity, genEntity, genEntity) { (a, b, c) =>
      val l = EntityMerge.merge2(EntityMerge.merge2(a, b), c)
      val r = EntityMerge.merge2(a, EntityMerge.merge2(b, c))
      assert(l.name == r.name && l.confidence == r.confidence &&
        l.attributes == r.attributes && l.context == r.context)
    }
  }

  test("merge2 is idempotent on itself") {
    forAll(genEntity) { a =>
      val m = EntityMerge.merge2(a, a)
      assert(m.name == a.name && m.confidence == a.confidence)
    }
  }

  test("ratio ∈ [0,1], reflexive-1 (difflib's ratio is deliberately NOT symmetric)") {
    val genStr = Gen.alphaNumStr.map(_.take(30))
    forAll(genStr, genStr) { (a, b) =>
      val r = Similarity.ratio(a, b)
      assert(r >= 0.0 && r <= 1.0)
      if (a == b) assert(r == 1.0)
      // faithful-port note: CPython difflib ratio("ab","ba") style inputs
      // give direction-dependent matched blocks; the linker neutralizes
      // this by always scoring pairs in (id1 < id2) order
    }
  }

  test("higher-confidence side always wins the name") {
    forAll(genEntity, genEntity) { (a, b) =>
      val m = EntityMerge.merge2(a, b)
      if (a.confidence > b.confidence) assert(m.name == a.name)
      if (b.confidence > a.confidence) assert(m.name == b.name)
    }
  }
}
