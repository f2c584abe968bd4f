package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature as a native SCALAR expression: input is the
  * per-document distinct shingle array, output is the K = `slices × 2`
  * signature values, each the minimum of a disjoint 5-hex-char slice of
  * md5(shingle) / md5("x" + shingle) over all shingles.
  *
  * Semantics are EXACTLY the declarative form it replaces
  * (explode(shingles) → groupBy(doc_id) → 12 × min(substring(md5(...), off,
  * 5))): a 5-lowercase-hex-char slice orders lexicographically identically
  * to its 20-bit numeric value, so the kernel tracks 12 int minima and
  * formats the winners as hex at the end — bit-for-bit the same strings,
  * and the DuckDB oracle SQL is unchanged.
  *
  * Why native, and why scalar: the shingle relation is ONE row per
  * document, so the signature needs no aggregation at all — the explode
  * materialized |shingles| rows per doc and pushed them through a
  * 12-expression generated hash-aggregate only because the declarative
  * form couldn't loop over an array cheaply. This kernel does the loop:
  * 2 md5 digests per shingle (thread-local MessageDigest, no per-call
  * lookup), 12 slice-extractions on raw digest bytes (no hex-string
  * materialization per shingle), inside WholeStageCodegen. It sits on the
  * hot path of q24/q37/q59 — the minhash family that dominates the bench.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  // null also for a non-null array with no usable (non-null) elements —
  // the declarative min() it mirrors yields NULL slices there
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashSig.compute($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Slices per digest; total signature length = 2 × SlicesPerDigest. */
  val SlicesPerDigest = 6
  val NumHashes: Int = SlicesPerDigest * 2
  /** Hex chars per slice (20 bits). */
  val SliceLen = 5

  /** Column API: MinHash signature (array of 12 five-hex-char minima) of a
    * distinct-shingle array.
    */
  def minhashSig(shingles: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graftbridge.ColumnBridge.expression(shingles)))

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** 20-bit value of hex chars [p, p+5) of a 16-byte digest: nibble j is
    * digest byte j/2, high half when j is even — identical to
    * `substring(hex(digest), p+1, 5)` compared as a lowercase-hex string.
    */
  private def slice20(d: Array[Byte], p: Int): Int = {
    var v = 0
    var j = p
    val end = p + SliceLen
    while (j < end) {
      val b = d(j >> 1) & 0xff
      v = (v << 4) | (if ((j & 1) == 0) b >>> 4 else b & 0xf)
      j += 1
    }
    v
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Kernel: called from both interpreted eval and generated code. */
  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val minima = Array.fill(NumHashes)(Int.MaxValue)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      val elem = shingles.getUTF8String(i)
      if (elem == null) { i += 1 } // skip, matching min()'s null-skip
      else {
      val bytes = elem.getBytes
      md.reset()
      md.update(bytes)
      val d1 = md.digest()
      md.reset()
      md.update('x'.toByte)
      md.update(bytes)
      val d2 = md.digest()
      var s = 0
      while (s < SlicesPerDigest) {
        val p = s * SliceLen
        val v1 = slice20(d1, p)
        if (v1 < minima(s)) minima(s) = v1
        val v2 = slice20(d2, p)
        if (v2 < minima(s + SlicesPerDigest)) minima(s + SlicesPerDigest) = v2
        s += 1
      }
      i += 1
      }
    }
    // empty / all-null input: min() over no rows is NULL, not a sentinel
    // signature — an Int.MaxValue formatting would make every degenerate
    // doc collide into one fake LSH cluster
    if (minima(0) == Int.MaxValue) return null
    val out = new Array[Any](NumHashes)
    var k = 0
    while (k < NumHashes) {
      val v = minima(k)
      val cs = new Array[Byte](SliceLen)
      var t = 0
      while (t < SliceLen) {
        cs(t) = hexChars((v >>> (4 * (SliceLen - 1 - t))) & 0xf).toByte
        t += 1
      }
      out(k) = UTF8String.fromBytes(cs)
      k += 1
    }
    new GenericArrayData(out)
  }
}
