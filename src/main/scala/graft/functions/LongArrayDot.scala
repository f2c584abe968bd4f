package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact dot product of two long-array columns as a native codegen
  * expression — the integer sibling of [[QuantizedDot]] for inputs that are
  * ALREADY fixed-point (e.g. IVF centroid sums, which are Σ floor(x·1e6)
  * longs and must stay exact integers for cross-engine determinism).
  *
  * Why not `aggregate(zip_with(...))`: higher-order-function lambdas run
  * interpreted row-at-a-time outside whole-stage codegen — acceptable in a
  * once-per-row projection, a scale-killer in an n×k assignment join (the
  * same anti-pattern QuantizedDot removed from the pair-verification path;
  * see its Scaladoc for the measured 100×).
  *
  * Overflow: IVF centroids are sums of ≤ n_cell quantized coords (|q| ≤
  * 2^21); with cells ≤ 2^20 docs the products stay ≤ 2^62 summed over 64
  * dims — inside Long for this workload; at larger scale divide centroid
  * sums by count first (means) before the dot.
  *
  * Null semantics match the declarative form it replaces: mismatched array
  * lengths or a null element on either side yield NULL (zip_with pads the
  * shorter array with nulls and null propagates through the sum) — a ragged
  * or malformed vector surfaces as a visible null, never as a
  * plausible-looking partial dot.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_array_dot expects two array<bigint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getLong(i) * ys.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |long $acc = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    $bad = true;
         |  } else {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  /** Column API: exact Σ aᵢ·bᵢ over two array<bigint> columns. */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
