package graft

import graft.functions.expressions.BloomMightContain.bloom_might_contain
import org.apache.spark.sql.functions._

/** Contracts for the Bloom runtime-prefilter surface (BloomMightContain +
  * CurationOps q124). */
class BloomPrefilterSpec extends SparkSpec {
  init()

  test("no false negatives: every inserted key passes the probe") {
    import spark.implicits._
    val keys = (0 until 5000).map(i => s"key-$i-${i * 31}")
    val df = keys.toDF("k")
    val bf = df.stat.bloomFilter("k", 10000L, 0.01)
    val missed = df.filter(!bloom_might_contain(col("k"), bf)).count()
    assert(missed == 0, s"$missed inserted keys rejected by the filter")
  }

  test("false-positive rate stays near the configured fpp") {
    import spark.implicits._
    val members = (0 until 5000).map(i => s"member-$i")
    val bf = members.toDF("k").stat.bloomFilter("k", 10000L, 0.01)
    val probes = (0 until 20000).map(i => s"outsider-$i").toDF("k")
    val fp = probes.filter(bloom_might_contain(col("k"), bf)).count()
    // 1% nominal; allow generous slack for hash variance on one sample
    assert(fp <= 20000 * 0.05, s"false-positive count $fp exceeds 5%")
  }

  test("probe agrees with driver-side mightContainString (build/probe " +
    "byte-compatibility)") {
    import spark.implicits._
    val members = (0 until 2000).map(i => s"αβγ-utf8-$i") // non-ASCII too
    val bf = members.toDF("k").stat.bloomFilter("k", 4000L, 0.01)
    val probes = members ++ (0 until 2000).map(i => s"other-$i")
    val sparkSide = probes.toDF("k")
      .select(col("k"), bloom_might_contain(col("k"), bf).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      assert(sparkSide(p) == bf.mightContainString(p), p)
    }
  }

  test("q124 bloom-prefiltered decontam is bit-identical to q85 broadcast " +
    "decontam") {
    val a = QueryRegistry.byName("q85_decontaminate_ngrams").fn(spark, sf)
    val b = QueryRegistry.byName("q124_bloom_prefilter_decontam").fn(spark, sf)
    val ra = a.collect().map(_.toSeq).toSeq
    val rb = b.collect().map(_.toSeq).toSeq
    assert(ra.nonEmpty, "q85 returned no rows at sf0.001")
    assert(ra == rb, "prefilter changed the exact result")
  }

  test("q124 plan: corpus-side probe sits below a shuffle (not broadcast) " +
    "join") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BaseJoinExec,
      BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    val df = QueryRegistry.byName("q124_bloom_prefilter_decontam").fn(spark, sf)
    // Force AQE finalization so the asserted plan is the one that RAN
    // (AQE may demote/promote joins at runtime), then walk it with a
    // traversal that descends through the stage wrappers — both
    // AdaptiveSparkPlanExec and QueryStageExec report no children, so a
    // plain collect() on the outer plan sees no join nodes at all.
    df.queryExecution.toRdd.count()
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case other => other.children.flatMap(nodes)
    })
    // Anchor the assertion to the SPECIFIC join the Bloom probe feeds:
    // the query also contains a totals join, so "some shuffle join exists
    // somewhere" could pass even if the verify join went broadcast. The
    // innermost join whose subtree prints the probe (traversal is
    // pre-order, so among nested matches the last is the closest above
    // the probe) is the verify join. Catalyst prints expressions via
    // prettyName (lowercased class name).
    val joinsOverProbe = nodes(df.queryExecution.executedPlan).collect {
      case j: BaseJoinExec
        if j.children.exists(_.toString.toLowerCase.contains("bloommightcontain")) => j
    }
    assert(joinsOverProbe.nonEmpty,
      s"no join has the bloom probe below it:\n${df.queryExecution.executedPlan}")
    val verifyJoin = joinsOverProbe.last
    assert(!verifyJoin.isInstanceOf[BroadcastHashJoinExec] &&
      !verifyJoin.isInstanceOf[BroadcastNestedLoopJoinExec],
      s"the bloom-verify join is broadcast — q124 exists precisely for eval " +
        s"sets too big to broadcast:\n$verifyJoin")
  }
}
