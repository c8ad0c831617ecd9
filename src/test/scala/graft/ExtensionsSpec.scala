package graft

import graft.plans.{GraftExtensions, StringRatioGte, StringRatioKernels}
import graft.functions.expressions.RatcliffObershelp
import graft.functions.expressions.StringRatio.string_ratio
import org.apache.spark.sql.functions._

/** Tests for the Catalyst extension point: the StringRatioGte optimizer
  * rewrite (difflib quick-bound short circuit) and SQL registration of the
  * custom expressions. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val installed = { GraftExtensions.install(spark); spark }

  test("optimizer rewrites string_ratio(a,b) >= t to the short-circuit form") {
    // parquet-backed source — a local relation would be constant-folded
    // away by ConvertToLocalRelation before the rewrite is visible
    val probe = "Customer#000000001"
    val df = Tables.t(installed, sf, "customer")
      .filter(string_ratio(col("c_name"), lit(probe)) >= 0.9)
      .select(col("c_name"))
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.toString.contains("string_ratio_gte"),
      s"rewrite missing in:\n$optimized")
    // same rows as the unfused kernel computed locally
    val expected = Tables.t(installed, sf, "customer")
      .select(col("c_name")).collect().map(_.getString(0))
      .count(n => RatcliffObershelp.ratio(n, probe) >= 0.9)
    assert(df.count() == expected && expected > 0)
  }

  test("short-circuit kernel agrees with the full ratio on random pairs") {
    val words = Seq("the bicycle thief", "the bicycle thieves", "stalker",
      "heat", "hate", "", "abab", "bababa", "the godfather part ii")
    for (a <- words; b <- words; t <- Seq(0.0, 0.5, 0.85, 1.0)) {
      assert(StringRatioKernels.ratioGte(a, b, t) ==
        (RatcliffObershelp.ratio(a, b) >= t), s"($a, $b, $t)")
    }
  }

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.registerSql(spark)
    val r = spark.sql(
      "SELECT string_ratio('heat', 'hate') AS r, " +
        "cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head()
    assert(r.getDouble(0) == 0.75)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }
}
