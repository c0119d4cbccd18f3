package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression computing the k-minhash signature of a text
 * column over word n-gram shingles, in ONE imperative pass.
 *
 * Why not built-ins: the declarative form ([[graft.ops.Dedup.minhashes]] —
 * `array((0 until k).map(j => array_min(transform(shingles, xxhash64))))`)
 * is k independent higher-order-function trees; HOFs are CodegenFallback,
 * so each of the k elements re-evaluates the whole shingle-construction
 * subtree interpreted. Measured at sf0.1 (5000 docs × ~50 shingles,
 * k=32): 203 s for the column form vs <1 s for this expression — the
 * entire round-1 bench timeout traced to this one projection.
 *
 * Hashing: XXH64 over the shingle's UTF-8 bytes with seed j for minhash
 * row j (Spark's own xxhash64 kernel, public). Tokens are split on
 * `\s+` (limit -1, matching the SQL `split` used by [[graft.ops.Dedup]]);
 * a document with fewer than n tokens yields Long.MaxValue rows
 * (documented degenerate bucket — such docs only collide with each other).
 */
case class MinHashSignature(child: Expression, k: Int, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($c, $k, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHashSignature {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, n: Int): ArrayData = {
    val toks = Ws.split(text.toString, -1)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val sh = UTF8String.fromString(sb.toString)
      var s = 0
      while (s < k) {
        val h = XXH64.hashUTF8String(sh, s.toLong)
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def apply(text: Column, k: Int, n: Int): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      MinHashSignature(
        org.apache.spark.sql.graftshim.GraftSql.expression(text), k, n))
}

/**
 * Native expression: DISTINCT xxhash64 values of a text's word n-gram
 * shingles, one imperative pass (same rationale as [[MinHashSignature]] —
 * the declarative explode(shingles(text)) + xxhash64 pays interpreted
 * HOF evaluation per row; this is the exact-Jaccard verifier's scan
 * kernel, so it runs over every candidate document).
 */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashes {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = Ws.split(text.toString, -1)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val sh = UTF8String.fromString(sb.toString)
      val h = XXH64.hashUTF8String(sh, 42L)
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.GraftSql.column(
      ShingleHashes(org.apache.spark.sql.graftshim.GraftSql.expression(text), n))
}
