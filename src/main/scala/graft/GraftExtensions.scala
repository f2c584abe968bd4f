package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{LongArrayDot, MinHashSig, QuantizedDot, ShingleSet, SortedIntersectCount, TextStats, WinnowKeys}

/** Session extension registering graft's native expressions for SQL use:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions") ...
  * spark.sql("SELECT quantized_dot(a.embedding, b.embedding) FROM ...")
  * spark.sql("SELECT shingle_set(text, 3) FROM docs")
  * spark.sql("SELECT text_stats(text).n_tokens FROM docs")
  * }}}
  *
  * [[GraftExtensions.register]] does the same on an already-running session
  * (useful in notebooks/tests). Registered functions:
  *
  *  - `quantized_dot(array<float>, array<float>) → bigint` — exact
  *    fixed-point dot (Σ floor(aᵢ·1e6)·floor(bᵢ·1e6));
  *  - `long_array_dot(array<bigint>, array<bigint>) → bigint`;
  *  - `shingle_set(text, n) → array<string>` — distinct word n-grams
  *    (n a literal int);
  *  - `text_stats(text) → struct` — one-pass token statistics (counts,
  *    distinct, summed length, rolling md5 fingerprint; stopword/lexicon
  *    variants stay on the Scala API where lists are parameters);
  *  - `minhash_sig(array<string>) → array<string>` — 12-slice MinHash
  *    signature of a shingle set;
  *  - `sorted_intersect_count(array<string>, array<string>) → int` —
  *    merge-count of two kernel-sorted arrays;
  *  - `winnow_keys(text, k, w) → array<string>` — distinct winnowed
  *    fingerprint keys (md5 hex ‖ zero-padded position; k, w literal
  *    ints).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def binary(name: String, mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$name expects 2 arguments, got ${exprs.length}")
    mk(exprs.head, exprs(1))
  }

  private val quantizedDotBuilder = binary("quantized_dot", QuantizedDot.apply)
  private val longArrayDotBuilder = binary("long_array_dot", LongArrayDot.apply)

  private val shingleSetBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"shingle_set expects 2 arguments, got ${exprs.length}")
    val n = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"shingle_set's second argument must be a literal int, got $other")
    }
    ShingleSet(exprs.head, n)
  }

  private val textStatsBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"text_stats expects 1 argument, got ${exprs.length}")
    TextStats(exprs.head, Nil, Nil, withFp = true)
  }

  private val minhashSigBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"minhash_sig expects 1 argument, got ${exprs.length}")
    MinHashSig(exprs.head)
  }

  private val sortedIntersectBuilder =
    binary("sorted_intersect_count", SortedIntersectCount.apply)

  private def litInt(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  private val winnowKeysBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"winnow_keys expects 3 arguments, got ${exprs.length}")
    WinnowKeys(exprs.head, litInt("winnow_keys k", exprs(1)),
      litInt("winnow_keys w", exprs(2)))
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "quantized_dot" -> quantizedDotBuilder,
    "long_array_dot" -> longArrayDotBuilder,
    "shingle_set" -> shingleSetBuilder,
    "text_stats" -> textStatsBuilder,
    "minhash_sig" -> minhashSigBuilder,
    "sorted_intersect_count" -> sortedIntersectBuilder,
    "winnow_keys" -> winnowKeysBuilder)

  private[graft] val descriptors: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name), new ExpressionInfo(classOf[GraftExtensions].getName, name), b)
    }

  /** Register on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
    }
}
