package graft.link

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.model.Entity

/**
 * Entity merge semantics — a port of `Entity.merge`
 * (/root/reference/src/knowledge/entity.py:39-85):
 *  - name: higher-confidence side wins; ties prefer the left/self side
 *  - confidence: max
 *  - context: concatenated with '\n' when both present and different
 *  - attributes: union; equal keys with different values → JSON list of
 *    both (the reference's scalar→list-on-conflict rule, entity.py:66-72;
 *    we keep values JSON-encoded strings so list-append semantics are
 *    preserved in a Map[String,String] column)
 *
 * The reference's fold is order-sensitive (SURVEY.md §7.4 risk 1): on
 * equal confidence the left name wins, and metadata precedence is
 * left-biased. To be deterministic under ANY partitioning we impose a
 * canonical total order — (confidence DESC, id ASC, segId ASC) — and make
 * `merge2` always fold the canonically-greater element onto the left.
 * The resulting Aggregator is commutative and associative, so Spark's
 * partial (map-side) + final aggregation is safe.
 */
object EntityMerge {

  private[link] def jsonList(values: Seq[String]): String =
    values.map(v => if (v.startsWith("[")) v.substring(1, v.length - 1) else quote(v))
      .mkString("[", ",", "]")
  private def quote(s: String): String =
    if (s.startsWith("\"")) s
    else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Canonical priority: true iff a should be treated as the 'self' side. */
  private[link] def leftWins(a: Entity, b: Entity): Boolean =
    if (a.confidence != b.confidence) a.confidence > b.confidence
    else if (a.id != b.id) a.id < b.id
    else a.segId <= b.segId

  /** Order-normalized merge of two entities (same canonical identity). */
  def merge2(x: Entity, y: Entity): Entity = {
    val (a, b) = if (leftWins(x, y)) (x, y) else (y, x)
    val name = if (a.confidence >= b.confidence) a.name else b.name
    val conf = math.max(a.confidence, b.confidence)
    val context = (a.context, b.context) match {
      case (Some(ca), Some(cb)) if ca != cb => Some(ca + "\n" + cb)
      case (ca, cb) => ca.orElse(cb)
    }
    val attrs = b.attributes.foldLeft(a.attributes) { case (acc, (k, v)) =>
      acc.get(k) match {
        case None => acc + (k -> v)
        case Some(existing) if existing == v => acc
        case Some(existing) if existing.startsWith("[") && v.startsWith("[") =>
          // combine lists without duplicates (entity.py:66-69)
          val ev = existing.substring(1, existing.length - 1).split(",").filter(_.nonEmpty)
          val nv = v.substring(1, v.length - 1).split(",").filter(_.nonEmpty)
          acc + (k -> (ev ++ nv.filterNot(ev.contains)).mkString("[", ",", "]"))
        case Some(existing) =>
          acc + (k -> jsonList(Seq(existing, v)))
      }
    }
    a.copy(name = name, confidence = conf, context = context, attributes = attrs)
  }

  /** Typed Aggregator: commutative+associative thanks to the canonical
    * ordering inside merge2 — safe for partial aggregation (map-side
    * combine), which is what makes entity dedup a single shuffle at scale.
    */
  val aggregator: Aggregator[Entity, Entity, Entity] =
    new Aggregator[Entity, Entity, Entity] {
      private val zero_ = Entity("", "", "", None, Map.empty, -1.0, "", "", "", "")
      override def zero: Entity = zero_
      override def reduce(b: Entity, a: Entity): Entity =
        if (b.confidence < 0) a else merge2(b, a)
      override def merge(b1: Entity, b2: Entity): Entity =
        if (b1.confidence < 0) b2 else if (b2.confidence < 0) b1 else merge2(b1, b2)
      override def finish(r: Entity): Entity = r
      override def bufferEncoder: Encoder[Entity] = Encoders.product[Entity]
      override def outputEncoder: Encoder[Entity] = Encoders.product[Entity]
    }

  /** Dedup mentions into canonical entities: one hash-aggregate shuffle on
    * the deterministic entity id (= sha(normName|type), SURVEY.md §1.3).
    */
  def dedupeMentions(mentions: Dataset[Entity]): Dataset[Entity] = {
    import mentions.sparkSession.implicits._
    mentions.groupByKey(_.id).agg(aggregator.toColumn).map(_._2)
  }
}
