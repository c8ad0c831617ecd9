package graft.operators

import graft.{GraftQuery, Tables}
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANSI-SQL surface: queries submitted through `spark.sql` with the SAME
  * SQL text serving as the DuckDB oracle — demonstrating that the engine's
  * SQL front door (Catalyst's parser/analyzer, correlated subqueries,
  * scalar subqueries) matches a reference SQL engine verbatim.
  */
object SqlSurface {

  private def withViews(s: SparkSession, d: String)(sql: String): DataFrame = {
    Seq("orders", "lineitem", "customer", "nation", "region").foreach { n =>
      t(s, d, n).createOrReplaceTempView(n)
    }
    s.sql(sql)
  }

  /** Explicit GROUPING SETS (beyond q11's ROLLUP / q51's CUBE): four
    * hand-picked sets with grouping() disambiguation — one partial
    * aggregation expanded per set, still a single shuffle in Spark's
    * Expand-based plan. Same ANSI text runs in both engines. */
  private val groupingSetsSql =
    """SELECT coalesce(CAST(c_nationkey AS VARCHAR(10)), 'ALL') AS nation,
      coalesce(c_mktsegment, 'ALL') AS segment,
      CAST(grouping(c_nationkey) * 2 + grouping(c_mktsegment) AS BIGINT) AS gid,
      count(*) AS cnt,
      CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      FROM customer WHERE c_nationkey < 5
      GROUP BY GROUPING SETS ((c_nationkey, c_mktsegment), (c_nationkey),
                              (c_mktsegment), ())
      ORDER BY gid, nation, segment"""

  private val q91 = GraftQuery(
    "q91_grouping_sets",
    (s, d) => withViews(s, d)(groupingSetsSql),
    Some(groupingSetsSql))

  /** Correlated EXISTS subquery — planned as a left-semi join by Catalyst
    * (the decorrelation rule), same shape as q05's explicit semi join. */
  private val existsSql =
    """SELECT o_orderpriority, count(*) AS cnt FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  private val q18 = GraftQuery(
    "q18_exists_subquery",
    (s, d) => withViews(s, d)(existsSql),
    Some(existsSql))

  /** Scalar subquery threshold (exact: max is order-independent). */
  private val scalarSql =
    """SELECT o_orderstatus, count(*) AS cnt FROM orders
      WHERE o_totalprice > (SELECT max(o_totalprice) / 2 FROM orders)
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  private val q19 = GraftQuery(
    "q19_scalar_subquery",
    (s, d) => withViews(s, d)(scalarSql),
    Some(scalarSql))

  /** Correlated LATERAL subquery with aggregate + per-group LIMIT — the
    * "top-2 per outer row" idiom in pure ANSI SQL. Catalyst DECORRELATES
    * it: the per-region LIMIT 2 becomes a WindowGroupLimit (rank
    * short-circuit, no full window sort) feeding ONE broadcast join
    * against region — no nested-loop re-execution per outer row, which is
    * what makes the construct survive a 1000-executor scale-up. Verified
    * in PLANS.md (no CartesianProduct, no per-row subquery). */
  private val lateralSql =
    """SELECT r_name, n_name, n_cust
      FROM region,
      LATERAL (SELECT n_name, count(*) AS n_cust
               FROM nation JOIN customer ON n_nationkey = c_nationkey
               WHERE n_regionkey = r_regionkey
               GROUP BY n_name
               ORDER BY n_cust DESC, n_name
               LIMIT 2)
      ORDER BY r_name, n_name"""

  private val q110 = GraftQuery(
    "q110_lateral_topk_per_region",
    (s, d) => withViews(s, d)(lateralSql),
    Some(lateralSql))

  /** RECURSIVE CTE (Spark 4's UnionLoop execution — new SQL surface in
    * 4.x): walk a synthetic binary hierarchy (parent(id) = id/2, the
    * doc-folder tree) to each document's root, reporting walk depth.
    * Spark iterates the loop with a distributed union per step — depth
    * is O(log N) iterations here, each a narrow map over the frontier.
    * Integer-safe division (CAST(floor(x/2) AS BIGINT)) keeps the SAME
    * text running on both engines ('/' is double-division in both).
    * The aggregate-over-recursion shape is q81's oracle pattern — here
    * it's the ENGINE side, closing the loop: Spark runs recursive SQL
    * too when the graph is shallow; the union-find operator remains the
    * scale path for deep/wide graphs. */
  private val recursiveSql =
    """WITH RECURSIVE chain(doc_id, anc, depth) AS (
        SELECT doc_id, doc_id, CAST(0 AS BIGINT) FROM documents
        UNION ALL
        SELECT doc_id, CAST(floor(anc / 2) AS BIGINT), depth + 1
        FROM chain WHERE anc > 0
      )
      SELECT doc_id, max(depth) AS depth,
        CAST(count(*) AS BIGINT) AS path_len
      FROM chain GROUP BY doc_id ORDER BY doc_id"""

  private val q115 = GraftQuery(
    "q115_recursive_hierarchy",
    (s, d) => {
      t(s, d, "documents").createOrReplaceTempView("documents")
      s.sql(recursiveSql)
    },
    Some(recursiveSql))

  val all: Seq[GraftQuery] = Seq(q18, q19, q91, q110, q115)
}
