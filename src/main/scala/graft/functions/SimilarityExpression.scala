package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String
import graft.link.Similarity

/**
 * Native Catalyst expression for the linker's pair score (C2) —
 * Ratcliff-Obershelp ratio + acronym rule (graft.link.Similarity.score).
 *
 * Versus the ScalaUDF it replaces: no ScalaUDF wrapper allocation, no
 * per-row encoder round-trip for the inputs, and the expression
 * participates in whole-stage codegen via a static call (the ratio
 * algorithm itself is imperative, so doGenCode emits a call into this
 * object rather than inlined arithmetic — the win is eliminating the
 * UDF serialization shim, not the call itself).
 *
 * Registered for SQL as `graft_similarity(a, b)` by [[GraftExtensions]].
 */
case class SimilarityScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityScore.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SimilarityScore.score($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_similarity"
}

object SimilarityScore {
  /** Static entry point shared by interpreted eval and generated code. */
  def score(a: UTF8String, b: UTF8String): Double =
    Similarity.score(a.toString, b.toString)

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      SimilarityScore(
        org.apache.spark.sql.graftshim.GraftSql.expression(a),
        org.apache.spark.sql.graftshim.GraftSql.expression(b)))
}

/**
 * Native Catalyst expression for the linker's merge-adjudication rule
 * (C3) — graft.link.Similarity.accept (the deterministic stand-in for the
 * reference's LLM merge decision, coreference_resolver.py:288-370). Same
 * rationale as [[SimilarityScore]]: replaces a ScalaUDF in the linker's
 * pair-scoring hot path so the candidate-pair plan stays inside
 * whole-stage codegen with no encoder round-trips.
 *
 * Registered for SQL as `graft_similarity_accept(a, b)`.
 */
case class SimilarityAccept(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimilarityAccept.accept(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SimilarityAccept.accept($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_similarity_accept"
}

object SimilarityAccept {
  /** Static entry point shared by interpreted eval and generated code. */
  def accept(a: UTF8String, b: UTF8String): Boolean =
    Similarity.accept(a.toString, b.toString)

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      SimilarityAccept(
        org.apache.spark.sql.graftshim.GraftSql.expression(a),
        org.apache.spark.sql.graftshim.GraftSql.expression(b)))
}

// Session extensions for SQL registration live in
// [[graft.functions.GraftExtensions]] (GraftFunctions.scala), which
// covers every graft kernel, these two included.
