package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native Catalyst aggregate (SURVEY.md §2.10 —
  * the sketch-style `TypedImperativeAggregate` surface): aggregates a
  * column of packed 62-bit shingle hashes (HashFunctions.packedHashes
  * layout: a' = h >>> 32, b = h & 0xffffffff) into the K-wide signature
  * min_k{(a' + k·b) mod 2^32} in ONE pass with a K-long mutable buffer.
  *
  * Equivalent to K separate min() aggregates (the DuckDB oracle computes
  * exactly that), but touches each input row once — at 100 TB the
  * difference between one partial-aggregate pass and K of them.
  */
case class MinHashSigAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val Mod32 = 4294967296L

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val a = h >>> 32
      val b = h & 0xffffffffL
      var k = 0
      while (k < numHashes) {
        val hk = (a + k * b) % Mod32
        if (hk < buf(k)) buf(k) = hk
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) { if (b2(k) < b1(k)) b1(k) = b2(k); k += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MinHashSigAgg =
    copy(child = c)
}

object MinHashSigAgg {
  /** Column-API entry point: `minhash_sig(packedHashCol)` → array<long>. */
  def minhash_sig(packedHash: Column, numHashes: Int = 12): Column =
    GraftBridge.column(
      MinHashSigAgg(GraftBridge.expression(packedHash), numHashes)
        .toAggregateExpression())
}
