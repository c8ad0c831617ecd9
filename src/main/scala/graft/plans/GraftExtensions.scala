package graft.plans

import graft.functions.expressions.{CosineSimilarity, RatcliffObershelp, StringRatio}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst extension point for the engine (SURVEY.md §4 item 3 — the
  * "custom Rule" stretch): an optimizer rule that turns thresholded fuzzy
  * string matching into a short-circuit form, plus SQL registration of the
  * custom expressions.
  *
  * The rule: `string_ratio(a, b) >= t` (the fuzzy-dedup predicate shape,
  * /root/reference/movie_generator.py:83-94) is rewritten to
  * [[StringRatioGte]], which evaluates difflib's own cheap upper bounds
  * first — `real_quick_ratio` (length-based) then `quick_ratio` (character
  * multiset) — and only runs the O(n·m) Ratcliff/Obershelp DP when the
  * bounds cannot refute the threshold. Exactly difflib's documented
  * quick-path contract, applied automatically by the optimizer so query
  * authors write the naive predicate.
  *
  * Installation: `GraftExtensions.install(spark)` (uses the public
  * `spark.experimental.extraOptimizations` hook), or through the
  * `spark.sql.extensions=graft.plans.GraftExtensions` session config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => StringRatioBoundRule)
    e.injectOptimizerRule(_ => RankFilterToTopK)
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  /** Post-hoc installation on a live session (public API only). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(StringRatioBoundRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ StringRatioBoundRule
    if (!spark.experimental.extraOptimizations.contains(RankFilterToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RankFilterToTopK
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    registerSql(spark)
  }

  /** Expose the custom expressions to the SQL surface. */
  def registerSql(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "string_ratio", exprs => StringRatio(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
  }
}

/** `string_ratio(a, b) >= threshold` with difflib's two-tier quick bounds:
  * upper₁ = 2·min(|a|,|b|)/(|a|+|b|)   (real_quick_ratio)
  * upper₂ = 2·Σ_c min(nₐ(c), n_b(c))/(|a|+|b|)  (quick_ratio)
  * ratio ≤ upper₂ ≤ upper₁, so a bound below the threshold refutes the
  * predicate without the DP. */
case class StringRatioGte(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "string_ratio_gte"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringRatioKernels.ratioGte(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.StringRatioKernels.ratioGte($a.toString(), $b.toString(), $threshold)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StringRatioGte =
    copy(left = newLeft, right = newRight)
}

object StringRatioKernels {
  // per-thread scratch (touched slots are reset after use) — a fresh 256KB
  // array per row would dominate the kernel it exists to speed up
  private val tlCounts = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](65536)
  }

  def ratioGte(a: String, b: String, t: Double): Boolean = {
    val la = a.length; val lb = b.length
    if (la == 0 && lb == 0) return 1.0 >= t
    if (la == 0 || lb == 0) return 0.0 >= t
    val denom = (la + lb).toDouble
    if (2.0 * math.min(la, lb) / denom < t) return false    // real_quick_ratio
    val counts = tlCounts.get()
    var i = 0
    while (i < la) { counts(a.charAt(i)) += 1; i += 1 }
    var common = 0
    i = 0
    while (i < lb) {
      val c = b.charAt(i)
      if (counts(c) > 0) { common += 1; counts(c) -= 1 }
      i += 1
    }
    // reset touched slots (cheaper than reallocating for short strings)
    i = 0
    while (i < la) { counts(a.charAt(i)) = 0; i += 1 }
    if (2.0 * common / denom < t) return false               // quick_ratio
    RatcliffObershelp.ratio(a, b) >= t
  }
}

/** Optimizer rule: `GreaterThanOrEqual(StringRatio(a,b), lit)` →
  * [[StringRatioGte]]. The rewrite removes the matched pattern, so the
  * rule is idempotent under Catalyst's fixed-point execution. */
object StringRatioBoundRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThanOrEqual(StringRatio(a, b), Literal(t: Double, _)) =>
        StringRatioGte(a, b, t)
      case LessThanOrEqual(Literal(t: Double, _), StringRatio(a, b)) =>
        StringRatioGte(a, b, t)
    }
}
