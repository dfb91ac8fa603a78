package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter bitmap aggregate: one pass over string keys builds a
  * `numBits`-bit membership filter as an `array<bigint>` of 64-bit
  * words (bit j of the filter is bit `j % 64` of word `j / 64`).
  *
  * This is the scale-correct online-dedup / decontamination pre-filter:
  * a TypedImperativeAggregate participates in partial aggregation, so
  * each map task ships exactly `numBits / 64` longs through the shuffle
  * regardless of input cardinality, and partial bitmaps merge by
  * bitwise OR (associative + commutative — partial aggregation order
  * cannot change the result, the exact-aggregate discipline for bit
  * sets). The finished bitmap is a few-KiB broadcastable value that
  * probes test with pure bit arithmetic — no join against the corpus.
  *
  * Bit positions are ENGINE-STABLE by construction: probe i of key s is
  * `md5("bloom{i}:" + s)` first 15 hex chars mod numBits — the same
  * md5Long(15) primitive every composed hash here uses, so an external
  * oracle re-derives identical positions and can verify membership with
  * set logic (a key is reported present iff ALL k of its bit positions
  * were set by SOME corpus key). NULL keys add no evidence and set no
  * bits.
  *
  * False-positive rate is the textbook (1 - e^{-kn/m})^k; sizing is the
  * caller's contract (numBits ≈ 10 bits/key with k=7 gives ~1%).
  */
case class BloomBuildAgg(
    keyExpr: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0 && numBits <= (1 << 26),
    "numBits must be a positive multiple of 64, at most 2^26 (8 MiB)")
  require(numHashes >= 1 && numHashes <= 32, "numHashes in [1, 32]")

  private def numWords: Int = numBits / 64

  override def checkInputDataTypes(): TypeCheckResult =
    if (keyExpr.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build key must be string, got ${keyExpr.dataType}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val key = keyExpr.eval(input)
    if (key != null) {
      val s = key.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < numHashes) {
        val pos = HashImpl.bloomPos(i, s, numBits)
        buf(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](numWords * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numWords)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(keyExpr)
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(keyExpr = newChildren.head)
}
