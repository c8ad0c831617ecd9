package graft

import graft.Tables.{dec, dsum, fixp}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Bit-identity contract for the LONG-accumulated fixed-point sum that
  * replaced sum(DECIMAL(18,s)) in the hot aggregates (Tables.dsum/fixp):
  * every DuckDB oracle twin still computes sum(DECIMAL) CAST AS DOUBLE,
  * so the two routes must land on the SAME double for every group — not
  * approximately, exactly. Both emit the correctly-rounded double of the
  * exact rational Σ/10^s, which this spec pins on adversarial 2dp data
  * (representation-error-maximizing cents like x.x1/x.x9, negatives,
  * large-magnitude sums) by running the decimal twin in Spark itself. */
class FixedPointSumSpec extends SparkSpec {
  init()

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // 2dp-born doubles: integer cents / 100.0 — exactly how the harness
  // parquet columns (prices, balances, event values) were generated.
  private val cents = Gen.choose(-99999999L, 99999999L)

  test("dsum == sum(DECIMAL) cast double, groupwise, s=2 and s=4") {
    val rows = samples(Gen.zip(Gen.choose(0, 9), cents), 4000)
      .map { case (g, c) => (g, c / 100.0) }
    val df = spark.createDataFrame(rows).toDF("g", "v")
    for (s <- Seq(2, 4)) {
      val got = df.groupBy(col("g"))
        .agg(dsum(col("v"), s).as("fp"),
          sum(dec(col("v"), s)).cast("double").as("dc"))
        .collect()
      got.foreach { r =>
        val (fp, dc) = (r.getDouble(1), r.getDouble(2))
        assert(java.lang.Double.doubleToLongBits(fp) ==
          java.lang.Double.doubleToLongBits(dc),
          s"s=$s group=${r.get(0)}: fixp=$fp decimal=$dc")
      }
    }
  }

  test("windowed fixp running sum == windowed decimal running sum") {
    import org.apache.spark.sql.expressions.Window
    val rows = samples(Gen.zip(Gen.choose(0, 4), cents), 2000)
      .zipWithIndex.map { case ((g, c), i) => (g, i.toLong, c / 100.0) }
    val df = spark.createDataFrame(rows).toDF("g", "i", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df.select(
      (sum(fixp(col("v"))).over(w).cast("double") / lit(100.0)).as("fp"),
      sum(dec(col("v"))).over(w).cast("double").as("dc")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"fixp=${r.getDouble(0)} decimal=${r.getDouble(1)}")
    }
  }

  test("fixp recovers exact integer units from representation-error doubles") {
    // 123.45 stored as double sits ~1e-14 off the rational; ×100 lands
    // ~1e-12 off the integer — round() must recover it for every cent
    // value in the adversarial sample.
    samples(cents, 2000).foreach { c =>
      val d = c / 100.0
      assert(math.round(d * 100.0) == c, s"$d -> ${d * 100.0}")
    }
  }
}
