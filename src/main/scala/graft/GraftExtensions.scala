package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.QuantizedDot

/** Session extension registering graft's native expressions for SQL use:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions") ...
  * spark.sql("SELECT quantized_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * [[GraftExtensions.register]] does the same on an already-running session
  * (useful in notebooks/tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.quantizedDotDescriptor)
}

object GraftExtensions {
  private def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"quantized_dot expects 2 arguments, got ${exprs.length}")
    QuantizedDot(exprs.head, exprs(1))
  }

  private[graft] val quantizedDotDescriptor = (
    FunctionIdentifier("quantized_dot"),
    new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
    (exprs: Seq[Expression]) => builder(exprs))

  /** Register on a live session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_dot", builder, "built-in")
}
