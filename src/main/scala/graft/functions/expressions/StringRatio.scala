package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Ratcliff/Obershelp similarity — the metric behind Python's
  * `difflib.SequenceMatcher(None, a, b, autojunk=False).ratio()` used by the
  * reference's fuzzy dedup (/root/reference/movie_generator.py:89: threshold
  * 0.85). Spark built-ins stop at levenshtein/soundex, so this is the one
  * genuinely custom scalar function the engine needs (SURVEY.md §4 item 2,
  * §7.3).
  *
  * Parity notes (pinned to difflib goldens in FunctionsSpec):
  *  - difflib's DEFAULT autojunk=True heuristic diverges for strings of
  *    length >= 200 (characters occurring in >1% of b are junked, changing
  *    the ratio). This implementation matches autojunk=False; the
  *    reference's titles are far below 200 chars, where the two agree.
  *  - comparison is over UTF-16 code units (Java chars) vs Python's code
  *    points: astral-plane characters (outside the BMP) count as 2 here
  *    and 1 in Python.
  *
  * ratio = 2·M / (|a| + |b|), where M is the total size of matched blocks
  * found by recursively taking the longest matching substring (ties:
  * earliest in a, then earliest in b — difflib's exact tie-break) and
  * recursing on both flanks.
  */
object RatcliffObershelp {

  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    2.0 * matchTotal(a, 0, a.length, b, 0, b.length) / (a.length + b.length)
  }

  /** Longest matching block in a[alo,ahi) × b[blo,bhi), then recurse.
    * O(n·m) per block via the classic suffix-length DP row. */
  private def matchTotal(a: String, alo: Int, ahi: Int,
                         b: String, blo: Int, bhi: Int): Int = {
    if (alo >= ahi || blo >= bhi) return 0
    // find longest common substring (difflib find_longest_match, no junk)
    var bestI = alo; var bestJ = blo; var bestLen = 0
    val row = new Array[Int](bhi - blo + 1)
    var i = alo
    while (i < ahi) {
      var prev = 0
      var j = blo
      while (j < bhi) {
        val tmp = row(j - blo + 1)
        if (a.charAt(i) == b.charAt(j)) {
          val len = prev + 1
          row(j - blo + 1) = len
          if (len > bestLen) {
            bestLen = len; bestI = i - len + 1; bestJ = j - len + 1
          }
        } else row(j - blo + 1) = 0
        prev = tmp
        j += 1
      }
      i += 1
    }
    if (bestLen == 0) 0
    else bestLen +
      matchTotal(a, alo, bestI, b, blo, bestJ) +
      matchTotal(a, bestI + bestLen, ahi, b, bestJ + bestLen, bhi)
  }
}

/** `string_ratio(a, b) -> double` as a codegen-capable Catalyst expression:
  * generated code calls the static kernel directly (no boxing beyond the
  * UTF8String→String decode). */
case class StringRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    RatcliffObershelp.ratio(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.RatcliffObershelp.ratio($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringRatio =
    copy(left = newLeft, right = newRight)
}

object StringRatio {
  def string_ratio(a: Column, b: Column): Column =
    GraftBridge.column(StringRatio(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
