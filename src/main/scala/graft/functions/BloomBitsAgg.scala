package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The [[graft.ops.Bloom]] bitmap as ONE native aggregate: each non-null
  * text contributes its K md5-slice bit positions; the buffer is the
  * packed 63-bits-per-word array (`Bloom.NumWords` longs ≈ 130 KB, fixed
  * size regardless of input rows); merge is word-wise OR; the result is
  * the big-endian serialized word array (BinaryType).
  *
  * This exists for the streaming-ingest state transition: with it, the
  * filter UPDATE rides the same aggregation job that computes the batch
  * metrics (map-side partial buffers, one 130 KB merge per partition)
  * instead of costing its own explode → shuffle → collect job per
  * micro-batch — the last separate per-batch job in
  * [[graft.streaming.DocIngest.processBatch]]. Bit layout is EXACTLY
  * `Bloom.build`'s (spec-pinned), so the result ORs straight into a
  * driver-array filter probed by [[BloomProbeHits]].
  *
  * Buffer size scales with the filter: width 5 (2^20 bits) → 130 KB per
  * partial buffer, width 6 → 2 MB. At width 7 (2^28 bits) each partial
  * buffer is 34 MB — prefer the frame form (`Bloom.build`, ≤ bits/63
  * ROWS map-side) at that size rather than per-partition 34 MB arrays.
  */
case class BloomBitsAgg(
    child: Expression,
    width: Int = 5,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_bits_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_bits_agg expects a string input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](graft.ops.Bloom.numWords(1L << (4 * width)))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val t = child.eval(input)
    if (t != null) {
      val dig = BloomProbeHits.digest(t.asInstanceOf[UTF8String])
      var i = 0
      while (i < graft.ops.Bloom.NumHashes) {
        val pos = BloomProbeHits.position(dig, i, width)
        val w = (pos / graft.ops.Bloom.BitsPerWord).toInt
        val bit = (pos % graft.ops.Bloom.BitsPerWord).toInt
        buf(w) |= 1L << bit
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBitsAgg =
    copy(child = newChildren.head)
}

object BloomBitsAgg {
  /** Aggregate Column: the serialized Bloom word array of a text column.
    * `width` is the md5-slice width — MUST match the probing filter's
    * ([[graft.ops.Bloom.widthOfWords]]). */
  def bloomBitsAgg(text: Column, width: Int = 5): Column =
    ColumnBridge.column(
      BloomBitsAgg(ColumnBridge.expression(text), width).toAggregateExpression())

  /** Decode the aggregate's binary result back to the word array. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}
