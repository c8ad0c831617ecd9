package graft

/** Dev tool: time registry queries under candidate session-conf scenarios
  * in ONE JVM (page cache + JIT equalized by per-scenario warmup) to
  * attribute the per-query fixed-overhead floor (VERDICT r4 "What's wrong"
  * #2) to its components before committing a config change to Bench.
  * Usage: sbt "runMain graft.ConfProbe [--sf dir] [q...]"
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val names0 = args.zipWithIndex.filterNot { case (a, i) =>
      a.startsWith("--") || (i > 0 && args(i - 1).startsWith("--"))
    }.map(_._1).toSeq
    def opt(flag: String, default: String): String = {
      val i = args.indexOf(flag); if (i >= 0 && i + 1 < args.length) args(i + 1) else default
    }
    val sfDir = opt("--sf", "/root/testdata/sf0.1")
    val names = if (names0.nonEmpty) names0 else Seq(
      "q55_percentiles", "q115_recursive_hierarchy", "q12_setops_nations",
      "q19_scalar_subquery", "q104_mixture_weights", "q01_pricing_summary",
      "q11_rollup_counts", "q42_session_window_30m", "q90_bm25_retrieval",
      "q106_curation_pipeline_e2e", "q03_join_revenue_by_segment",
      "q08_running_sum_per_user",
      // heavies: guard against regressions from aggressive coalescing
      "q79_passjoin_k2_varlen", "q35_ngram_jaccard_blocked",
      "q121_dedup_canonical", "q34_minhash_lsh_pairs")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", ShmDir.claim("graft-bench"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    def exec(n: String): Long =
      QueryRegistry.byName(n).fn(spark, sfDir).queryExecution.toRdd.count()
    def dropCached(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    // Phase-3 floor scenarios (r5 verdict item 7): the bounded-reduce tier
    // already runs aqe=off,sp=8 — probe whether a narrower static width or
    // the hash-aggregate exec choice shaves the remaining ~0.3 s stage-
    // launch floor. sp=1 is the "single-partition local execution" bound:
    // every exchange in the tier is enum-keyed/top-k-clamped, so width is
    // a latency knob, not a scale knob, for THESE queries only.
    val scenarios: Seq[(String, Map[String, String])] = Seq(
      "gate(aqe=off,sp=8)" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8"),
      "aqe=off,sp=4" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "4"),
      "aqe=off,sp=1" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "1"),
      "aqe=off,sp=8,objagg=off" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.execution.useObjectHashAggregateExec" -> "false")
    )
    val defaults = scenarios.flatMap(_._2.keys).distinct
      .map(k => k -> spark.conf.getOption(k)).toMap
    val out = scala.collection.mutable.Map.empty[(String, String), Double]
    for ((label, confs) <- scenarios) {
      defaults.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      names.foreach { n => try exec(n) catch { case _: Throwable => () } }
      dropCached()
      for (n <- names) {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val dt = try { exec(n); (System.nanoTime() - t0) / 1e9 }
                   catch { case _: Throwable => -1.0 }
          dropCached(); dt
        }
        out((n, label)) = ts.filter(_ >= 0).minOption.getOrElse(-1.0)
      }
    }
    println(f"${"query"}%-36s ${scenarios.map(_._1).map(s => f"$s%-18s").mkString}")
    for (n <- names) {
      val row = scenarios.map { case (l, _) => f"${out((n, l))}%-18.3f" }.mkString
      println(f"$n%-36s $row")
    }
    for ((l, _) <- scenarios) {
      val tot = names.map(n => out((n, l))).filter(_ >= 0).sum
      println(f"TOTAL $l%-18s $tot%.3f")
    }
    spark.stop()
  }
}
