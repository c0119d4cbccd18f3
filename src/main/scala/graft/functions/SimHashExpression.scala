package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression computing the 64-bit SimHash fingerprint of a
 * text column in ONE imperative pass.
 *
 * Why not built-ins: the declarative spec ([[graft.ops.Dedup.simhash]] —
 * 64 `size(filter(hashes, bit-test))` higher-order subtrees reduced with
 * bitwiseOR) re-evaluates the tokenize+hash subtree interpreted for every
 * bit (HOFs are CodegenFallback): ~128 interpreted passes over the token
 * array per row, measured 268.6 s at sf0.1 — 62% of the round-2 bench
 * (round-2 verdict item 1; the same trap [[MinHashSignature]] fixed for
 * minhash in round 1). This kernel hashes each distinct token once and
 * bit-votes in a 64-int tally: identical output, one pass.
 *
 * Semantics (property-tested equal to the declarative spec): tokens =
 * whitespace split (limit -1), distinct by string; token hash =
 * XXH64(utf8, seed 42) — Spark's own `xxhash64` default seed; bit i of
 * the fingerprint is set iff strictly more than half the distinct tokens
 * have bit i set.
 */
case class SimHash64(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object SimHash64 {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val toks = Ws.split(text.toString, -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        n += 1
        val h = XXH64.hashUTF8String(UTF8String.fromString(t), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  def apply(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      SimHash64(org.apache.spark.sql.graftshim.GraftSql.expression(text)))
}

/**
 * Native predicate: does ANY element of a string array match a regex
 * (java `Matcher.find`, the same semantics as Spark's RLike)?
 *
 * Why not built-ins: `exists(map_values(attributes), v => v.rlike(p))` is
 * a higher-order function — CodegenFallback — which drags the WHOLE filter
 * it appears in out of whole-stage codegen (round-2 verdict item 3:
 * ~230 µs/row, two orders over codegen'd rlike). This expression compiles
 * the pattern once per task and loops imperatively inside codegen, so the
 * text-search filters (graph_query.py:689-724 semantics) stay fused.
 */
case class RegexAnyMatch(child: Expression, pattern: String) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0
    var found = false
    while (!found && i < arr.numElements()) {
      if (!arr.isNullAt(i) &&
        compiled.matcher(arr.getUTF8String(i).toString).find()) found = true
      i += 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("graftAnyMatchPattern", compiled,
      classOf[java.util.regex.Pattern].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = false;
         |for (int gi = 0; gi < $c.numElements() && !${ev.value}; gi++) {
         |  if (!$c.isNullAt(gi) &&
         |      $patRef.matcher($c.getUTF8String(gi).toString()).find()) {
         |    ${ev.value} = true;
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_regex_any"
}

object RegexAnyMatch {
  def apply(arr: Column, pattern: String): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      RegexAnyMatch(org.apache.spark.sql.graftshim.GraftSql.expression(arr), pattern))
}
