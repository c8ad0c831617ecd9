package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a native mergeable Catalyst
  * aggregate (the third sketch family next to HLL distinct counts and GK
  * quantiles, SketchOps): at most `k` (token → counter) pairs, one pass,
  * O(k) state. The EXACT heavy-hitters query (q109's wordcount) shuffles
  * the full vocabulary — 10^8+ keys at web scale; this shuffles k counters
  * per partition, period.
  *
  * Guarantees (deterministic theorems, NOT distribution assumptions —
  * they hold for every input order and every merge tree, which is what
  * makes the q129 error-contract gate hash-checkable even though the
  * summary contents themselves depend on partitioning):
  *
  *  - undercount only: est(x) <= count(x);
  *  - bounded error:   count(x) - est(x) <= (N - M) / (k+1), where N is
  *    the stream length and M the sum of retained counters;
  *  - retention: any x with count(x) > (N - M)/(k+1) is IN the summary.
  *
  * Merge rule (sum counters; if over k keys, subtract the (k+1)-th largest
  * counter from all and drop non-positives) preserves all three bounds —
  * Agarwal et al., "Mergeable Summaries", PODS 2012. The decrement step of
  * both update and merge removes k+1 units of counter mass for at most
  * k+1 units of stream mass, which is the whole proof of the bound.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // classic MG step: new key collides with a full summary →
          // decrement every counter (the new item's single unit is
          // discarded along with one unit of each of the k survivors)
          val keys = buf.keysIterator.toArray
          var i = 0
          while (i < keys.length) {
            val nk = keys(i)
            val nv = buf(nk) - 1
            if (nv <= 0) buf.remove(nk) else buf.update(nk, nv)
            i += 1
          }
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    if (b1.size > k) {
      val vals = b1.values.toArray
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1)) // (k+1)-th largest
      val keys = b1.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val nk = keys(i)
        val nv = b1(nk) - sub
        if (nv <= 0) b1.remove(nk) else b1.update(nk, nv)
        i += 1
      }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic key order inside the map value (map equality is
    // order-insensitive, but stable output bytes cost nothing)
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(
        entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map { case (key, _) => key.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + items.indices.map(i => 4 + bytes(i).length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(b: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(b)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.update(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object MisraGriesAgg {
  /** Column-API entry point: `mg_summary(tokenCol, k)` → map<string,long>. */
  def mg_summary(token: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(token), k).toAggregateExpression())
}
