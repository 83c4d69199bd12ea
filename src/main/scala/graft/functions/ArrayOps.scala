package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native set-operation kernels for the dedup verify stage.
  *
  * `array_intersect` builds a hash set per invocation — fine for one
  * call, pathological for millions of candidate pairs (it dominated
  * q17's runtime). When both inputs are SORTED DISTINCT long arrays the
  * intersection count is a single allocation-free linear merge, kept
  * inside whole-stage codegen via `doGenCode`. This is the preferred
  * extension path from the build brief: a native Catalyst `Expression`
  * (with codegen) over a UDF.
  */
object ArrayOps {

  /** Linear merge intersection count of two sorted-distinct long
    * arrays. Invoked from interpreted eval and generated code.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** `sorted_intersect_count(a, b)` — |a ∩ b| for sorted distinct
    * array&lt;long&gt; inputs (callers sort via `array_sort`).
    */
  def sorted_intersect_count(a: Column, b: Column): Column =
    Shim.column(SortedIntersectCountExpr(Shim.expression(a), Shim.expression(b)))

  /** Exact integer dot product of two equal-length long arrays —
    * replaces the interpreted `aggregate(zip_with(...))` pair in the
    * cosine hot path (HOFs don't participate in codegen; this does).
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    // ragged pairs MUST fail loudly: UnsafeArrayData.getLong has no
    // runtime bounds check, so indexing b past its length would read
    // adjacent buffer memory and return a silently wrong dot product —
    // one dirty short-embedding row would poison dedup/ANN scores with
    // no exception anywhere
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_long: ragged vectors ($n vs ${b.numElements()} dims)")
    var i = 0
    var s = 0L
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** `dot_long(a, b)` — Σ a(i)·b(i) over array&lt;long&gt;. */
  def dot_long(a: Column, b: Column): Column =
    Shim.column(DotLongExpr(Shim.expression(a), Shim.expression(b)))

  /** Newest-wins merge of two NAME-SORTED cell arrays
    * (struct&lt;name:binary, value:binary, write_time:long&gt;) — the
    * row-local compaction reconcile (the merge Cassandra does across
    * SSTable generations, SURVEY.md §1): one linear pass, equal names
    * resolved to the higher write_time (right side wins ties — the
    * newer generation). Keeps the whole two-generation merge inside
    * codegen when the generations arrive co-partitioned, so compaction
    * over co-bucketed sink files is join + this kernel: ZERO shuffles.
    */
  def mergeColumns(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = b.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n + m)
    var i = 0
    var j = 0
    while (i < n && j < m) {
      val ra = a.getStruct(i, 3)
      val rb = b.getStruct(j, 3)
      val c = java.util.Arrays.compareUnsigned(ra.getBinary(0), rb.getBinary(0))
      if (c < 0) { out += ra.copy(); i += 1 }
      else if (c > 0) { out += rb.copy(); j += 1 }
      else {
        out += (if (ra.getLong(2) > rb.getLong(2)) ra.copy() else rb.copy())
        i += 1
        j += 1
      }
    }
    while (i < n) { out += a.getStruct(i, 3).copy(); i += 1 }
    while (j < m) { out += b.getStruct(j, 3).copy(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** `merge_columns(a, b)` — newest-wins merge of two sorted cell
    * arrays; `b` wins write_time ties. */
  def merge_columns(a: Column, b: Column): Column =
    Shim.column(MergeColumnsExpr(Shim.expression(a), Shim.expression(b)))
}

case class MergeColumnsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  // any array-of-struct cell shape; the struct layout is positional
  override def inputTypes: Seq[Shim.AbstractType] = Seq(ArrayType, ArrayType)
  override def dataType: DataType = left.dataType
  override def prettyName: String = "merge_columns"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.mergeColumns(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayOps.mergeColumns($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[Shim.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayOps.dotLong($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[Shim.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayOps.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
