package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Fused single-pass kernel for the document-quality n-gram statistics
  * behind the C4/Gopher cleaning rules (q84/q103/q106): token count,
  * distinct-token count, most-frequent-token count, distinct-trigram
  * count, most-frequent-bigram count — ONE traversal of the token array
  * with open hashing, instead of five HigherOrderFunction trees.
  *
  * Why a custom Expression (SURVEY §7.3 decision table): Spark's
  * array/lambda HOFs are CodegenFallback — every metric pays interpreted
  * per-element evaluation with boxed accumulators, and Catalyst's
  * CollapseProject/PushDownPredicate substitute alias definitions into
  * consuming expressions, so "stage the array once" does not survive
  * optimization (measured: 12 s for the q106 quality filter at sf0.1 in
  * pure-HOF form, ~1 s with this kernel). A codegen-capable scalar
  * expression keeps the whole filter inside the WholeStageCodegen span
  * and is CSE-eligible, so multiple metric references cost one pass.
  *
  * Engine-portable: counts over exact string equality — the DuckDB twins
  * keep their list_distinct/list_transform forms and hash-match.
  */
object TokenMetricsKernel {
  /** Returns {n_tokens, uniq_tokens, top_token_count, uniq_trigrams,
    * top_bigram_count} over a whitespace-token array. */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val tokCounts = new java.util.HashMap[String, Integer](n * 2)
    var topTok = 0
    i = 0
    while (i < n) {
      val c = tokCounts.merge(toks(i), 1, (a, b) => a + b)
      if (c > topTok) topTok = c
      i += 1
    }
    val biCounts = new java.util.HashMap[String, Integer](n * 2)
    val triSet = new java.util.HashSet[String](n * 2)
    var topBi = 0
    i = 0
    while (i < n - 1) {
      val bi = toks(i) + " " + toks(i + 1)
      val c = biCounts.merge(bi, 1, (a, b) => a + b)
      if (c > topBi) topBi = c
      if (i < n - 2) triSet.add(bi + " " + toks(i + 2))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n, tokCounts.size, topTok, triSet.size, topBi))
  }
}

/** `token_metrics(array<string>) -> struct` — see [[TokenMetricsKernel]]. */
case class TokenMetrics(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("uniq_tokens", IntegerType, nullable = false),
    StructField("top_token_count", IntegerType, nullable = false),
    StructField("uniq_trigrams", IntegerType, nullable = false),
    StructField("top_bigram_count", IntegerType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenMetricsKernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.TokenMetricsKernel.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): TokenMetrics =
    copy(child = newChild)
}

object TokenMetrics {
  def token_metrics(toks: Column): Column =
    GraftBridge.column(TokenMetrics(GraftBridge.expression(toks)))
}
