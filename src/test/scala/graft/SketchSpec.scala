package graft

import graft.operators.SketchOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-relative-error contracts for the sketch aggregates (q122/q123)
  * vs their EXACT twins — the correctness discipline for the two registry
  * entries that cannot hash-match a cross-engine oracle by construction
  * (HLL / GK internals hash engine-specifically). Same house pattern as
  * q118's exhaustive-rank pin: the approximate answer must sit provably
  * close to the exact one, at every scale factor the suite tests.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("q122 HLL distinct counts within 3 sigma of exact (rsd = 0.02)") {
    import graft.functions.TextFunctions.tokens
    val approx = SketchOps.q122.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.t(spark, sf, "documents")
      .select(col("lang"), explode(tokens(lower(col("text")))).as("tok"))
    val exactPerLang = toks.groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = exactPerLang +
      ("__all__" -> toks.agg(countDistinct(col("tok"))).head().getLong(0))
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val relErr = math.abs(approx(k) - e).toDouble / e
      // rsd 0.02 -> 3 sigma = 6% relative error bound
      assert(relErr <= 0.06, s"lang=$k exact=$e approx=${approx(k)} err=$relErr")
    }
  }

  test("q123 GK quantiles: every answer's rank within epsilon of target") {
    val rows = SketchOps.q123.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val orders = Tables.t(spark, sf, "orders")
    // accuracy 1000 -> rank error <= 1/1000; +0.0005 discreteness slack
    val eps = 0.0015
    for (r <- rows) {
      val prio = r.getString(0)
      val n = r.getAs[Long]("n").toDouble
      val grp = orders.filter(col("o_orderpriority") === prio)
      for ((q, i) <- Seq(0.25, 0.5, 0.75, 0.95).zipWithIndex) {
        val v = r.getDouble(1 + i)
        val below = grp.filter(col("o_totalprice") < v).count() / n
        val atOrBelow = grp.filter(col("o_totalprice") <= v).count() / n
        assert(below <= q + eps && atOrBelow >= q - eps,
          s"$prio p$q=$v rank=[$below,$atOrBelow] outside +-$eps")
      }
    }
  }

  test("sketch plans are partial+final aggregations (mergeable at scale)") {
    // the 100-TB property: the sketch is built map-side (partial_ mode)
    // and merged — ONE exchange per aggregate, carrying fixed-size
    // sketches, never the raw keys; the only sorts sit above the
    // aggregated (group-cardinality) rows.
    for (q <- Seq(SketchOps.q122, SketchOps.q123)) {
      val plan = q.fn(spark, sf).queryExecution.executedPlan
      val s = plan.toString
      assert(s.contains("partial_approx_count_distinct") ||
             s.contains("partial_approx_percentile"),
        s"${q.name}: no map-side partial sketch in plan\n$s")
      val exchanges = s.linesIterator.count(_.contains("Exchange"))
      // q122: per-lang agg + global agg + ordered output of <= |langs|+1
      // rows; q123: one agg + ordered output of |priorities| rows. The
      // post-aggregate sorts move group-cardinality rows, not data.
      val maxEx = if (q.name.startsWith("q122")) 3 else 2
      assert(exchanges <= maxEx,
        s"${q.name}: $exchanges exchanges (expected <= $maxEx)\n$s")
    }
  }
}
