package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(col, filter) -> boolean`: membership probe of a
  * string column against a pre-built Bloom filter, as a codegen-capable
  * Catalyst expression — the manual form of the engine-internal runtime
  * filter Spark injects for some shuffle joins (its
  * `BloomFilterMightContain` expression is not SQL-registered or callable
  * from the public API, so the query-level pattern needs its own).
  *
  * The filter object rides the serialized expression into task closures
  * (`BloomFilter` is `Serializable`; its size is set by the build-side
  * capacity/fpp, NOT by the probe-side data — bounded bytes per task at
  * any corpus scale) and is referenced directly from generated code via
  * `addReferenceObj`, so the hot path is one hash-probe per row with no
  * per-row deserialization or boxing.
  *
  * Build/probe consistency: the probe hashes the column's UTF-8 bytes
  * (`mightContainBinary(utf8.getBytes)`), which is bit-compatible with
  * both `putString` and the binary path `DataFrameStatFunctions
  * .bloomFilter` uses on string columns (`putString(s)` is defined as
  * `putBinary(utf8(s))` in the public sketch library). No false
  * negatives, ≤fpp false positives — callers must re-verify exactly
  * (see CurationOps q124) or carry the fpp in their error contract.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any =
    bloom.mightContainBinary(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def bloom_might_contain(c: Column, bloom: BloomFilter): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(c), bloom))
}
