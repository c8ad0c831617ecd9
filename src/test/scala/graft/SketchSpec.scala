package graft

import graft.operators.SketchOps
import org.apache.spark.sql.functions._

/** Bounded-relative-error contracts for the sketch aggregates vs their
  * EXACT twins. The PURE sketch shapes (SketchOps.approxDistinct /
  * approxQuantile — the 100-TB production forms) are pinned here at value
  * level, since their estimates hash engine-specifically and can never ride
  * a cross-engine hash gate. The REGISTRY rows q122/q123 check the same
  * contracts in-query (boolean verdicts + exact aggregates, portable) and
  * are asserted all-green below; the driver's DuckDB oracle re-checks them
  * bit-for-bit. Shares SparkSpec's session — a suite-private builder here
  * would pin the JVM-global codegen cache at the 100-entry default if this
  * suite ran first (ADVICE r6).
  */
class SketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("HLL distinct counts within 3 sigma of exact (rsd = 0.02)") {
    import graft.functions.TextFunctions.tokens
    val approx = SketchOps.approxDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = Tables.t(spark, sfDir, "documents")
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

  test("GK quantiles: every answer's rank within epsilon of target") {
    val rows = SketchOps.approxQuantile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val orders = Tables.t(spark, sfDir, "orders")
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

  test("registry gate rows q122/q123: every in-query contract verdict true") {
    // the driver's hash oracle compares these outputs bit-for-bit against
    // all-TRUE twins; assert the same here so a contract break fails fast
    val r122 = SketchOps.q122.fn(spark, sfDir).collect()
    assert(r122.nonEmpty)
    r122.foreach(r => assert(r.getBoolean(2), s"q122 out of bound: $r"))
    val r123 = SketchOps.q123.fn(spark, sfDir).collect()
    assert(r123.nonEmpty)
    r123.foreach { r =>
      (2 to 5).foreach(i => assert(r.getBoolean(i), s"q123 out of bound: $r"))
    }
  }

  test("Misra-Gries: undercount-only + (N-M)/(k+1) bound under ANY split") {
    // the mergeable-summaries contract (Agarwal et al. PODS 2012) must
    // hold for every partitioning/merge tree — exercise three radically
    // different splits of the same stream and check every guarantee
    // against exact counts, including retention of guaranteed heavy
    // hitters. k=8 over a ~31-token vocabulary: genuinely lossy.
    import graft.functions.expressions.MisraGriesAgg.mg_summary
    val k = 8
    val toks = Tables.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (parts <- Seq(1, 7, 32)) {
      val m = toks.repartition(parts)
        .agg(mg_summary(col("tok"), k)).head().getMap[String, Long](0)
      val sketch = m.keysIterator.map(t => t -> m(t)).toMap
      assert(sketch.size <= k, s"parts=$parts: ${sketch.size} > k")
      val retained = sketch.values.sum
      val bound = (n - retained) / (k + 1) // integer floor, conservative
      sketch.foreach { case (t, est) =>
        assert(est <= exact(t), s"parts=$parts: $t overcounted $est > ${exact(t)}")
        assert(exact(t) - est <= bound,
          s"parts=$parts: $t error ${exact(t) - est} > bound $bound")
      }
      // retention: any token with exact count > bound MUST be present
      exact.foreach { case (t, c) =>
        if (c > bound)
          assert(sketch.contains(t),
            s"parts=$parts: guaranteed heavy hitter $t (cnt=$c > $bound) missing")
      }
    }
  }

  test("registry gate row q129: every in-query MG contract verdict true") {
    val r129 = SketchOps.q129.fn(spark, sfDir).collect()
    assert(r129.length == 10)
    r129.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3), s"q129 out of bound: $r")
    }
  }

  test("sketch plans are partial+final aggregations (mergeable at scale)") {
    // the 100-TB property, asserted on the PURE sketch shapes: the sketch
    // is built map-side (partial_ mode) and merged — ONE exchange per
    // aggregate, carrying fixed-size sketches, never the raw keys; the
    // only sorts sit above the aggregated (group-cardinality) rows.
    for ((nm, df) <- Seq(
        "approxDistinct" -> SketchOps.approxDistinct(spark, sfDir),
        "approxQuantile" -> SketchOps.approxQuantile(spark, sfDir),
        "mgHeavyHitters" -> SketchOps.mgHeavyHitters(spark, sfDir))) {
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("partial_approx_count_distinct") ||
             s.contains("partial_approx_percentile") ||
             s.contains("partial_misragriesagg"),
        s"$nm: no map-side partial sketch in plan\n$s")
      val exchanges = s.linesIterator.count(_.contains("Exchange"))
      // approxDistinct: per-lang agg + global agg + ordered output of
      // <= |langs|+1 rows; approxQuantile: one agg + ordered output of
      // |priorities| rows; mgHeavyHitters: one global agg, <= k output
      // rows. Post-aggregate sorts move group-cardinality rows, not data.
      val maxEx = if (nm == "approxDistinct") 3 else 2
      assert(exchanges <= maxEx,
        s"$nm: $exchanges exchanges (expected <= $maxEx)\n$s")
    }
  }
}
