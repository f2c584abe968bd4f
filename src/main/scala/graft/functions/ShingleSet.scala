package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct word n-gram shingling as a native expression:
  * lowercase → trim → whitespace-split → n-gram join → first-occurrence
  * distinct, in a single kernel call per row.
  *
  * Semantics match the declarative form
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(split(trim(lower(text)), "\\s+"), i, n))))` exactly — whitespace
  * is the regex `\s` class `[ \t\n\f\r]`, identical in Java regex and
  * RE2 (DuckDB), so the oracle SQL is unchanged. (Oracles and every
  * Spark consumer use the SET — counts, minima, posting explodes —
  * so output ORDER is free; the kernel emits canonical UTF8String
  * binary order, which [[SortedIntersectCount]]'s merge requires.)
  *
  * Why native: that declarative pipeline is four higher-order functions,
  * all interpreted (lambdas don't codegen) and each materializing an
  * intermediate array per row. Shingling is the per-row hot loop of corpus
  * dedup at 100 TB; this runs as one static call inside WholeStageCodegen
  * with a single output allocation.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects (string, n>=1), got ${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleSet.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {

  /** Column API: distinct word n-gram shingles of raw text. */
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text), n))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Kernel: called from both interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    // tokenize on \s+ runs (post-trim, so no leading/trailing empties)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len && isWs(s.charAt(i))) i += 1
    var start = i
    while (i < len) {
      if (isWs(s.charAt(i))) {
        if (i > start) toks.add(s.substring(start, i))
        while (i < len && isWs(s.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    if (start < len) toks.add(s.substring(start, len))
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    // canonical form: UTF8String binary order. Every consumer is
    // order-free (MinHash minima, posting explodes, intersect/union
    // SIZES — and the oracles only ever compare counts, via
    // order-insensitive list_intersect/list_distinct), while
    // SortedIntersectCount REQUIRES this order for its merge-count.
    java.util.Arrays.sort(out, new java.util.Comparator[AnyRef] {
      override def compare(x: AnyRef, y: AnyRef): Int =
        x.asInstanceOf[UTF8String].compareTo(y.asInstanceOf[UTF8String])
    })
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
}
