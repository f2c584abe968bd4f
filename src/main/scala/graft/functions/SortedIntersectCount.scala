package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| of two string arrays SORTED in UTF8String binary order, as a
  * single two-pointer merge — the classic similarity-join verify step
  * (AllPairs/PPJoin verification is exactly this merge; Bayardo et al.
  * WWW'07). Numerically identical to `size(array_intersect(a, b))` over
  * distinct inputs; the win is the inner loop: `array_intersect` builds a
  * per-call hash set of A (one allocation + hash per element, interpreted
  * `NullIntolerant` eval), while this runs one branch-predictable
  * comparison merge inside WholeStageCodegen with zero allocation. On the
  * prefix-filter verify path the expression evaluates once per CANDIDATE
  * PAIR — millions of times per corpus — which is what justifies a native
  * kernel (the same bar MinHashSig/ShingleSet met).
  *
  * PRECONDITION: both inputs sorted ascending in UTF8String binary order
  * (Spark's `array_sort` on strings) and duplicate-free, as produced by
  * [[NearDup.shingleSets]]. Unsorted input gives undercounts — callers own
  * the invariant; it is not re-checked per row.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two string arrays, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Column API: merge-count of two sorted, distinct string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Kernel: called from both interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { n += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    n
  }
}
