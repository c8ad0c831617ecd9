package graft.operators

import graft.GraftQuery
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph ranking over engine tables — the link-authority quality signal a
  * web-scale curation pipeline computes per host (Common-Crawl-style corpus
  * weighting; same operator family as the reference's implied
  * `ai_clustering_service` graph analyses, /root/reference/backend/routes.py:5).
  *
  * q131 is PageRank (Brin & Page 1998) run for a FIXED number of rounds in
  * exact integer arithmetic so it hash-checks cross-engine (the q128
  * discipline): rank mass in micro-units, per-edge contribution
  * `r div outdeg` (integer division), damping 0.85 applied as
  * `(17*s) div 20`, teleport base `150000 div N`. Dangling-node mass is
  * dropped (the standard simplification; identical on both engines).
  *
  * Scale shape: one superstep = edges ⋈ ranks (shuffle keyed by src,
  * broadcast-able when the node table is host-sized) → one hash aggregation
  * keyed by dst. Ranks stay node-sized; only the edge scan is fact-scale.
  * This is exactly q121's label-propagation physique with a different
  * per-round combine — nothing grows with iteration count but plan depth,
  * which a fixed 3 rounds bounds.
  */
object GraphOps {

  private val Iters = 3

  /** Directed nation-level trade graph: customer's nation → supplier's
    * nation for every observed (order, lineitem) trade lane, self-loops
    * dropped, deduplicated to distinct lanes. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "supplier"), col("s_suppkey") === col("l_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .distinct()

  private val q131 = GraftQuery(
    "q131_pagerank_trade_graph",
    (s, d) => {
      val edges = tradeEdges(s, d)
      val outdeg = edges.groupBy(col("src"))
        .agg(count(lit(1)).cast("long").as("od"))
      val st = t(s, d, "nation").agg(count(lit(1)).cast("long").as("nn"))
      val nodes = t(s, d, "nation").select(col("n_nationkey").as("node"))
      var ranks = nodes.crossJoin(broadcast(st))
        .select(col("node"), expr("1000000 div nn").as("r"))
      for (_ <- 1 to Iters) {
        val sums = edges
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .join(outdeg, Seq("src"))
          .select(col("dst").as("node"), expr("r div od").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("s"))
        ranks = nodes.join(sums, Seq("node"), "left")
          .crossJoin(broadcast(st))
          .select(col("node"),
            expr("150000 div nn + (17 * coalesce(s, 0L)) div 20").as("r"))
      }
      ranks
        .join(t(s, d, "nation"), col("node") === col("n_nationkey"))
        .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node").as("nation_key"), col("n_name"),
          col("r").as("pr_micro"),
          coalesce(col("od"), lit(0L)).as("out_deg"))
        .orderBy(col("pr_micro").desc, col("nation_key"))
    },
    Some("""WITH edges AS (
        SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM customer c
          JOIN orders o ON o.o_custkey = c.c_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE c.c_nationkey <> s.s_nationkey),
      outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od
                 FROM edges GROUP BY src),
      st AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nation),
      r0 AS (SELECT n_nationkey AS node, 1000000 // nn AS r FROM nation, st),
      c1 AS (SELECT e.dst AS node, CAST(sum(r.r // o.od) AS BIGINT) AS s
             FROM edges e JOIN r0 r ON r.node = e.src
               JOIN outdeg o ON o.src = e.src
             GROUP BY e.dst),
      r1 AS (SELECT n.node,
               150000 // st.nn + (17 * coalesce(c1.s, 0)) // 20 AS r
             FROM r0 n LEFT JOIN c1 ON c1.node = n.node, st),
      c2 AS (SELECT e.dst AS node, CAST(sum(r.r // o.od) AS BIGINT) AS s
             FROM edges e JOIN r1 r ON r.node = e.src
               JOIN outdeg o ON o.src = e.src
             GROUP BY e.dst),
      r2 AS (SELECT n.node,
               150000 // st.nn + (17 * coalesce(c2.s, 0)) // 20 AS r
             FROM r1 n LEFT JOIN c2 ON c2.node = n.node, st),
      c3 AS (SELECT e.dst AS node, CAST(sum(r.r // o.od) AS BIGINT) AS s
             FROM edges e JOIN r2 r ON r.node = e.src
               JOIN outdeg o ON o.src = e.src
             GROUP BY e.dst),
      r3 AS (SELECT n.node,
               150000 // st.nn + (17 * coalesce(c3.s, 0)) // 20 AS r
             FROM r2 n LEFT JOIN c3 ON c3.node = n.node, st)
      SELECT r3.node AS nation_key, n.n_name, r3.r AS pr_micro,
             coalesce(o.od, 0) AS out_deg
      FROM r3 JOIN nation n ON n.n_nationkey = r3.node
        LEFT JOIN outdeg o ON o.src = r3.node
      ORDER BY pr_micro DESC, nation_key"""))

  val all: Seq[GraftQuery] = Seq(q131)
}
