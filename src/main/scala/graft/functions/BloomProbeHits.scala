package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-wise Bloom-filter probe against a driver-resident bitmap: `n_hits` =
  * how many of the document's K bit positions are set in `words`.
  *
  * This is the streaming-ingest fast path for [[graft.ops.Bloom]]. The
  * declarative probe (explode K positions → broadcast-join the word table →
  * re-aggregate per doc → join back) costs two shuffles per micro-batch;
  * at a fixed filter size (2^20 bits ≈ 16 K longs ≈ 130 KB) the bitmap is
  * small enough to ship inside the task binary and probe per row inside
  * WholeStageCodegen — no joins, no shuffles, same bits.
  *
  * Bit layout is EXACTLY [[graft.ops.Bloom]]'s (md5 20-bit slices, 63 bits
  * per word so the oracle's checked `<<` arithmetic never overflows);
  * equality with the declarative probe is spec-pinned per batch. The
  * positions are computed from the md5 digest nibbles directly — no hex
  * string materializes per row.
  */
case class BloomProbeHits(child: Expression, words: Array[Long], width: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_probe_hits expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bloom_probe_hits"

  override def nullSafeEval(input: Any): Any =
    BloomProbeHits.hits(input.asInstanceOf[UTF8String], words, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomProbeHits.hits($c, $wordsRef, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeHits =
    copy(child = newChild)
}

object BloomProbeHits {

  def apply(text: Column, words: Array[Long], width: Int = 5): Column =
    ColumnBridge.column(
      BloomProbeHits(ColumnBridge.expression(text), words, width))

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private[functions] def digest(text: UTF8String): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest(text.getBytes)
  }

  /** Slice i's position = hex chars [w·i, w·i+w) of the digest (w = slice
    * width, 5/6/7 for 2^20/2^24/2^28-bit filters), read straight from the
    * nibbles (no hex string materializes per row). */
  private[functions] def position(dig: Array[Byte], i: Int, width: Int): Long = {
    var pos = 0L
    var k = width * i
    val end = k + width
    while (k < end) {
      // hex char k = high nibble of byte k/2 when k even, else low nibble
      val b = dig(k >> 1) & 0xFF
      val nib = if ((k & 1) == 0) b >>> 4 else b & 0xF
      pos = (pos << 4) | nib
      k += 1
    }
    pos
  }

  /** Kernel shared by interpreted eval and generated code: md5 the text,
    * read K 20-bit positions as nibble slices of the digest, count set
    * bits. Layout mirrors `Bloom.positions`: slice i = hex chars
    * [5i, 5i+5) of the digest, word = pos / 63, bit = pos % 63.
    */
  def hits(text: UTF8String, words: Array[Long], width: Int): Int = {
    val dig = digest(text)
    var n = 0
    var i = 0
    while (i < graft.ops.Bloom.NumHashes) {
      val pos = position(dig, i, width)
      val w = (pos / graft.ops.Bloom.BitsPerWord).toInt
      val bit = (pos % graft.ops.Bloom.BitsPerWord).toInt
      if (w < words.length && ((words(w) >>> bit) & 1L) == 1L) n += 1
      i += 1
    }
    n
  }
}
