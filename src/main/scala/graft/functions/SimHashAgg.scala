package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash as ONE native aggregate: input is each token's md5 hex
  * digest; the buffer holds 64 bit-counters + the token count; the result
  * packs the majority bits into a long (bit 63 ↔ first hex nibble's high
  * bit, so `lower(lpad(hex(result),16,'0'))` reproduces the hex-string
  * form used for banding).
  *
  * Replaces 64 separate `sum(shiftright(nibble...))` aggregate expressions
  * — the generated aggregation method shrinks from thousands of lines to a
  * single imperative update (16 hex chars → 64 counter increments), which
  * both runs faster and stays reliably JIT-compiled.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg expects a hex-string input, got ${child.dataType.simpleString}")

  // buffer: 64 bit counters + total count
  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = child.eval(input)
    if (h != null) {
      val s = h.asInstanceOf[UTF8String]
      // parse the first 16 hex chars; nibble p (0-based) covers bits
      // 63-4p .. 60-4p
      // md5 hex is pure ASCII → bytes are chars
      val n = math.min(16, s.numBytes())
      var p = 0
      while (p < n) {
        val c = s.getByte(p).toChar
        val nib =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else 0
        val base = p * 4
        // counter index: bit (63 - base - b) for b in 0..3 (hex char's
        // high bit first)
        buf(base) += (nib >> 3) & 1
        buf(base + 1) += (nib >> 2) & 1
        buf(base + 2) += (nib >> 1) & 1
        buf(base + 3) += nib & 1
        p += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(64)
    var out = 0L
    var i = 0
    while (i < 64) {
      // majority rule identical to the expression form: 2·ones ≥ n
      if (buf(i) * 2 >= n) out |= 1L << (63 - i)
      i += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Aggregate Column: 64-bit simhash (as a long) of a hex-digest column. */
  def simhashAgg(hexDigest: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(hexDigest)).toAggregateExpression())
}
