package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}

/** Skew-evidence runner (VERDICT r6 "Next round" #5): execute the heavy
  * shuffle-join/window queries against the Zipf-boosted ScaleGen output
  * (`ScaleGen <src> <out> <reps> skew`) and record how the engine absorbs
  * a hot key, in two regimes per query:
  *
  *  1. `aqe` — AQE with broadcast allowed: at this data scale AQE turns
  *     the dim joins into broadcasts, which are SKEW-IMMUNE (no shuffle of
  *     the fact side by the hot key at all) — the correct plan, and the
  *     first line of defense;
  *  2. `aqe_nobc` — broadcast disabled (`autoBroadcastJoinThreshold=-1`),
  *     modeling the fact×fact regime where both sides exceed broadcast at
  *     cluster scale: the sort-merge join shuffles on the hot key and
  *     AQE's OptimizeSkewedJoin must SPLIT the hot partition
  *     (`numSkewedPartitions`/`numSplits` reported from the
  *     AQEShuffleRead metrics, `isSkew=true` visible in the plan).
  *
  * Plus `static_conf` (the registry's per-query conf) for contrast. Skew
  * thresholds are sized to the single-node data scale (a 15M-row fact
  * spreads ~6 MB per reduce partition; the 256 MB default targets
  * cluster-sized partitions): the DEMONSTRATION — detection by
  * factor×median and splitting to advisory size — is scale-free.
  *
  * Usage: SPARK_GRAFT_BIG_DIR=/tmp/graft-sf1-skew sbt "runMain graft.SkewProbe [names...]"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_BIG_DIR", "/tmp/graft-sf1-skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q03_join_revenue_by_segment", "q88_star_join_q5",
        "q08_running_sum_per_user", "q34_minhash_lsh_pairs")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", ShmDir.claim("graft-skew"))
      // skew thresholds sized to single-node partition scale (see doc)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESHOLD", "1m"))
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESHOLD", "1m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    def dropCached(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    // full tree walk: query stages hang their subplan off .plan (children
    // is Nil), and the adaptive root off .executedPlan
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: inner.flatMap(nodes)
    }
    // report shuffle reads that either carry real volume or were
    // skew-split; `skewed=...` metrics are the split evidence
    def skewStats(plan: SparkPlan): Seq[String] =
      nodes(plan).collect {
        case r: AQEShuffleReadExec
            if r.metrics.get("numSkewedPartitions").exists(_.value > 0) ||
              r.metrics.get("partitionDataSize").exists(_.value > 500000) =>
          val m = r.metrics.collect {
            case (k, v) if v.value > 0 => s"$k=${v.value}"
          }.toSeq.sorted.mkString(" ")
          val tag = if (r.metrics.get("numSkewedPartitions")
              .exists(_.value > 0)) "SKEW-SPLIT" else "read"
          s"$tag | $m"
      }
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (n <- names) {
      def build() = QueryRegistry.byName(n).fn(spark, dir)
      def runPlain(): (Double, SparkPlan) = {
        val qe = build().queryExecution
        (timeIt(qe.toRdd.count(): Unit), qe.executedPlan)
      }
      runPlain(); dropCached()
      val (tAqe, planAqe) = runPlain()
      dropCached()
      val (tNobc, planNobc) = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try { runPlain(); dropCached(); runPlain() }
        finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      dropCached()
      val tStatic = {
        def run() = timeIt(QueryRegistry.withExecConfs(spark, n, dir) {
          build().queryExecution.toRdd.count(): Unit
        })
        run(); dropCached(); run()
      }
      dropCached()
      println(f"\n=== $n  aqe=$tAqe%.3f s  aqe_nobc=$tNobc%.3f s  static_conf=$tStatic%.3f s")
      val bc = nodes(planAqe).count(_.getClass.getSimpleName.contains("BroadcastHashJoin"))
      val skAqe = skewStats(planAqe)
      println(s"  broadcast-allowed plan: $bc BroadcastHashJoin node(s)" +
        (if (skAqe.isEmpty) " (skew-immune: hot key never shuffles)"
         else skAqe.map("\n    " + _).mkString))
      val sk = skewStats(planNobc)
      println(if (sk.isEmpty) "  no-broadcast plan: no shuffle read above thresholds"
        else "  no-broadcast plan:" + sk.map("\n    " + _).mkString)
    }
    spark.stop()
  }
}
