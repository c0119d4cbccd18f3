package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable holder for the current winner; `row` is null until the first
  * update. The UnsafeRow layout is struct(d: double, s: string, payload).
  */
final class KeepRowBuf(var row: UnsafeRow)

/**
 * Hash-aggregable argmin: keeps the `payload` struct of the row with the
 * smallest `(ordD, ordS)` pair (Double.compare, then UTF8String binary
 * order — the same total order Spark's struct ordering applies to a
 * (double, string) prefix; nulls first on both, though pipeline inputs
 * are non-null). Exists because EVERY declarative keep-row form —
 * `min_by(struct(...))`, `min(struct(...))`, even `min(string)` — has a
 * non-primitive aggregation buffer and therefore compiles to
 * SortAggregateExec in Spark 4.1: a full O(n log n) sort of the input on
 * BOTH map and final sides whose external-merge working set is memory-
 * bandwidth-bound. Measured on the 1.28M-file KG corpus (StageProbe,
 * BASELINE.md round 6): the sort-based merge_build stage burned 5.2x the
 * CPU-seconds at 8 threads vs 2 threads for IDENTICAL work — the
 * concurrent sort runs saturate the shared memory bus — collapsing
 * 2→8-core stage scaling to 0.27. As a TypedImperativeAggregate this
 * lands in ObjectHashAggregateExec: one O(n) hash pass, per-group state
 * = one winner row, map-side partial combine intact. Pair with a raised
 * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (Spark's
 * default of 128 map entries silently degrades OHA back to sort-based
 * on any real group cardinality — set in graft.runtime.Sessions).
 *
 * SIZING CONTRACT: the per-task object map holds one live buffer per
 * distinct group, so this aggregate is for group cardinalities that fit
 * a task-local map (≲ a few 100k groups/task — the node-name attach in
 * GraphBuilder). For MILLIONS of groups per task the map's long-lived
 * object population makes young GC quadratic-feeling (measured: 12.9 s →
 * 1038 s task GC time on the 1.28M-file edge dedup) — there, use the
 * narrow-winner-plus-semi-join shape instead (GraphBuilder's edge
 * keep-max): sort-aggregate a 5-column projection and fetch winning wide
 * rows by hash semi join, so wide rows take one linear shuffle and the
 * unavoidable sort touches only ~50-byte rows.
 *
 * Unlike the declarative forms, `payload` may contain non-orderable
 * fields (maps): it is never compared, only carried.
 */
case class KeepRowBy(
    ordD: Expression,
    ordS: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KeepRowBuf] {

  override def children: Seq[Expression] = Seq(ordD, ordS, payload)
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (ordD.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"ordD must be double, got ${ordD.dataType}")
    else if (ordS.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"ordS must be string, got ${ordS.dataType}")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(s"payload must be a struct, got ${payload.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val payloadType = payload.dataType.asInstanceOf[StructType]
  private lazy val payloadArity = payloadType.size
  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](DoubleType, StringType, payloadType))
  @transient private lazy val scratch = new Array[Any](3)
  @transient private lazy val scratchRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(scratch)

  /** asc-nulls-first on (d, s): the order `min_by(v, struct(d, s))` and
    * `min(struct(d, s, ...))` with a unique `s` both realize. Doubles
    * compare like Spark's nan-safe ordering: NaN greatest and NaN = NaN
    * (as Double.compare), but -0.0 = 0.0 (where bare Double.compare
    * diverges — the `x == y` short-circuit restores Spark's equality).
    */
  private def less(d1: Any, s1: Any, d2: Any, s2: Any): Boolean = {
    val c1 =
      if (d1 == null && d2 == null) 0
      else if (d1 == null) -1
      else if (d2 == null) 1
      else {
        val x = d1.asInstanceOf[Double]; val y = d2.asInstanceOf[Double]
        if (x == y) 0 else java.lang.Double.compare(x, y)
      }
    if (c1 != 0) return c1 < 0
    if (s1 == null && s2 == null) false
    else if (s1 == null) true
    else if (s2 == null) false
    else s1.asInstanceOf[UTF8String].compareTo(s2.asInstanceOf[UTF8String]) < 0
  }

  override def createAggregationBuffer(): KeepRowBuf = new KeepRowBuf(null)

  override def update(buf: KeepRowBuf, input: InternalRow): KeepRowBuf = {
    val d = ordD.eval(input)
    val s = ordS.eval(input)
    if (buf.row == null || less(d, s, bufD(buf), bufS(buf))) {
      scratch(0) = d
      scratch(1) = s
      scratch(2) = payload.eval(input)
      buf.row = proj(scratchRow).copy()
    }
    buf
  }

  private def bufD(buf: KeepRowBuf): Any =
    if (buf.row.isNullAt(0)) null else buf.row.getDouble(0)
  private def bufS(buf: KeepRowBuf): Any =
    if (buf.row.isNullAt(1)) null else buf.row.getUTF8String(1)

  override def merge(buf: KeepRowBuf, other: KeepRowBuf): KeepRowBuf = {
    if (other.row != null &&
        (buf.row == null || less(bufD(other), bufS(other), bufD(buf), bufS(buf))))
      buf.row = other.row
    buf
  }

  override def eval(buf: KeepRowBuf): Any =
    if (buf.row == null) null else buf.row.getStruct(2, payloadArity)

  override def serialize(buf: KeepRowBuf): Array[Byte] =
    if (buf.row == null) Array.emptyByteArray else buf.row.getBytes

  override def deserialize(bytes: Array[Byte]): KeepRowBuf =
    if (bytes.isEmpty) new KeepRowBuf(null)
    else {
      val r = new UnsafeRow(3)
      r.pointTo(bytes, bytes.length)
      new KeepRowBuf(r)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KeepRowBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeepRowBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KeepRowBy =
    copy(ordD = newChildren(0), ordS = newChildren(1), payload = newChildren(2))
  override def prettyName: String = "keep_row_by"
}

object KeepRowBy {
  /** Column form: the payload struct of the row minimizing (ordD, ordS). */
  def minRow(ordD: Column, ordS: Column, payload: Column): Column =
    GraftSql.column(
      KeepRowBy(
        GraftSql.expression(ordD),
        GraftSql.expression(ordS),
        GraftSql.expression(payload)).toAggregateExpression())
}
