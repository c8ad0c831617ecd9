package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact Jaccard similarity of two SORTED, DISTINCT string arrays by
  * linear merge — |A∩B| via one allocation-free two-pointer pass, then
  * J = inter / (|A| + |B| − inter).
  *
  * Why a custom Expression (SURVEY §7.3): the built-in
  * `array_intersect`/`array_union` pair builds two hash sets of boxed
  * UTF8Strings PER ROW — on an all-pairs-within-block join that is per
  * PAIR (q35: 622k pairs at sf0.1 → measured 46.8 s; DuckDB's equivalent
  * list ops pay 41.4 s). Sorting each document's shingle set once on the
  * build side (array_sort in the pre-join projection, so it rides the
  * shuffle materialized) and merging here runs the same join in ~1 s,
  * bit-identical output: set operations are order-independent, the
  * merge counts exactly |A∩B|, and the final division is the same IEEE
  * op as the built-in form (including 0/0 → NaN for two empty sets).
  *
  * Precondition: both inputs sorted by UTF8String binary order with no
  * duplicates (shingles() emits distinct; array_sort provides order).
  */
object SortedJaccardKernel {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      // binaryCompare, NOT compareTo: Spark 4's compareTo prepends an
      // isTesting() misuse guard that reads System.getenv PER CALL —
      // thread dumps of the sf10 full-registry pass showed 12 of 20
      // executor threads inside ProcessEnvironment from exactly this
      // line (billions of merge-step comparisons each paying an env
      // lookup). binaryCompare is the sanctioned fast path compareTo
      // itself delegates to, so the ordering is bit-identical.
      val c = a.getUTF8String(i).binaryCompare(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

/** `sorted_jaccard(a, b) -> double` — see [[SortedJaccardKernel]]. */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccardKernel.jaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.SortedJaccardKernel.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  def sorted_jaccard(a: Column, b: Column): Column =
    GraftBridge.column(SortedJaccard(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
