package graft

import graft.operators.InvariantChecks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Negative controls for the in-query invariant contracts (VERDICT r8
  * #1): each check must actually be able to FAIL — a contract that
  * returns true on a corrupted labeling verifies nothing. Every test
  * feeds a small hand-built graph through the same check the registry
  * queries carry, once intact (expect true) and once deliberately
  * corrupted (expect false). The affirmative side at harness scale is
  * pinned by QueriesSpec (q81/q131/q137/q148 columns) and by the
  * sf0.01 oracle, which pins the booleans to literal TRUE.
  */
class InvariantsSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def oneBool(df: DataFrame, c: String): Boolean =
    df.select(col(c)).head().getBoolean(0)

  // triangle graph 1-2-3 plus pendant 4: canonical edges
  private def und: DataFrame =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")

  test("componentChecks: intact labeling passes, corrupted labelings fail") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val good = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L)
      .toDF("key", "comp")
    val g = InvariantChecks.componentChecks(edges, good)
    assert(oneBool(g, "inv_edges_ok") && oneBool(g, "inv_canonical_ok"))
    // split a true component: edge 2-3 now crosses labels
    val split = Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 5L -> 5L, 6L -> 5L)
      .toDF("key", "comp")
    assert(!oneBool(InvariantChecks.componentChecks(edges, split),
      "inv_edges_ok"))
    // non-minimal label: component {1,2,3} labeled by 2, not its min
    val nonMin = Seq(1L -> 2L, 2L -> 2L, 3L -> 2L, 5L -> 5L, 6L -> 5L)
      .toDF("key", "comp")
    assert(!oneBool(InvariantChecks.componentChecks(edges, nonMin),
      "inv_canonical_ok"))
    // DROPPED node: keys 5/6 missing from the labeling entirely — the
    // left-join audit must flip, not silently exclude their edge
    val dropped = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L).toDF("key", "comp")
    assert(!oneBool(InvariantChecks.componentChecks(edges, dropped),
      "inv_edges_ok"))
  }

  test("pageRankMassCheck: conserved superstep passes, lost mass fails") {
    // 2-node cycle, ranks 10 each, out-degree 1 each -> each contributes
    // its full rank (10 - 10 mod 1 = 10); correct sums carry 10 per node
    val ranks = Seq(1L -> 10L, 2L -> 10L).toDF("node", "r")
    val outdeg = Seq(1L -> 1L, 2L -> 1L).toDF("src", "od")
    val sums = Seq(1L -> 10L, 2L -> 10L).toDF("node", "s")
    assert(oneBool(InvariantChecks.pageRankMassCheck(ranks, outdeg, sums), "ok"))
    // a dropped contribution (node 2 never received its 10)
    val lost = Seq(1L -> 10L).toDF("node", "s")
    assert(!oneBool(InvariantChecks.pageRankMassCheck(ranks, outdeg, lost), "ok"))
    // a duplicated contribution
    val dup = Seq(1L -> 10L, 2L -> 20L).toDF("node", "s")
    assert(!oneBool(InvariantChecks.pageRankMassCheck(ranks, outdeg, dup), "ok"))
    // integer-division residue is modeled: od=3 keeps only 3*(10 div 3)=9
    val r3 = Seq(1L -> 10L).toDF("node", "r")
    val o3 = Seq(1L -> 3L).toDF("src", "od")
    val s9 = Seq(2L -> 9L).toDF("node", "s")
    assert(oneBool(InvariantChecks.pageRankMassCheck(r3, o3, s9), "ok"))
    val s10 = Seq(2L -> 10L).toDF("node", "s")
    assert(!oneBool(InvariantChecks.pageRankMassCheck(r3, o3, s10), "ok"))
  }

  test("triangleCheck: correct per-node counts pass, off-by-one fails") {
    // one triangle among 1-2-3; node 4 in no triangle
    val good = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L).toDF("node", "triangles")
    assert(oneBool(InvariantChecks.triangleCheck(und, good), "tri_xcheck"))
    val over = Seq(1L -> 2L, 2L -> 1L, 3L -> 1L).toDF("node", "triangles")
    assert(!oneBool(InvariantChecks.triangleCheck(und, over), "tri_xcheck"))
    val miss = Seq(1L -> 1L, 2L -> 1L).toDF("node", "triangles")
    assert(!oneBool(InvariantChecks.triangleCheck(und, miss), "tri_xcheck"))
  }

  test("bfsChecks: true BFS labeling passes, three corruption modes fail") {
    // path 0-1-2-3-4 (sym adjacency), BFS depth 3 from 0
    val es = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val adj = (es ++ es.map(_.swap)).toDF("u", "v")
    val good = Seq(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> -1L)
      .toDF("node", "hops")
    assert(oneBool(InvariantChecks.bfsChecks(adj, good, 0L, 3), "bfs_ok"))
    // frontier stopped early: node 2 marked unreached though 1 settled
    val early = Seq(0L -> 0L, 1L -> 1L, 2L -> -1L, 3L -> -1L, 4L -> -1L)
      .toDF("node", "hops")
    assert(!oneBool(InvariantChecks.bfsChecks(adj, early, 0L, 3), "bfs_ok"))
    // invented label: node 4 claims hops=1 with no hops=0 neighbor
    val invented = Seq(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 1L)
      .toDF("node", "hops")
    assert(!oneBool(InvariantChecks.bfsChecks(adj, invented, 0L, 3), "bfs_ok"))
    // wrong source label
    val badSrc = Seq(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> -1L)
      .toDF("node", "hops")
    assert(!oneBool(InvariantChecks.bfsChecks(adj, badSrc, 0L, 3), "bfs_ok"))
    // DROPPED node: node 2 has no row at all (vs the -1 sentinel) — its
    // edges must flip the left-join audit, not vanish from it
    val droppedNode = Seq(0L -> 0L, 1L -> 1L, 3L -> 3L, 4L -> -1L)
      .toDF("node", "hops")
    assert(!oneBool(InvariantChecks.bfsChecks(adj, droppedNode, 0L, 3),
      "bfs_ok"))
  }

  test("q35 sampled cross-check engages: sampled pairs exist at sf0.01") {
    // non-vacuous sampling: the ~1/997 hash sample must actually select
    // pairs at the correctness-gate sf, otherwise jacc_xck pins nothing
    val out = QueryRegistry.byName("q35_ngram_jaccard_blocked")
      .fn(spark, "/root/testdata/sf0.01")
    val sampled = out.filter(pmod(hash(col("a_id"), col("b_id")), lit(997)) === 0)
    assert(sampled.count() > 0, "hash sample selected no pairs at sf0.01")
    // and every row's cross-check verdict holds
    assert(out.filter(!col("jacc_xck")).count() == 0)
  }
}
