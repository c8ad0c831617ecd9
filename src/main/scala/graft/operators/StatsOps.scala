package graft.operators

import graft.GraftQuery
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical / behavioral analytics operators — the product-analytics
  * surface beyond plain aggregation (q95 z-scores, q107 correlation):
  * behavior modeling (Markov transitions), pattern mining (association
  * rules), hypothesis testing (chi-square), and inequality measurement
  * (Gini). Everything follows the exact-integer house discipline: counts
  * and micro-unit ratios via integer division, so every output
  * hash-checks cross-engine (no float accumulation order anywhere).
  */
object StatsOps {

  /** q144 — first-order Markov transition matrix over the event stream:
    * P(next event type | current), the behavior model behind "what does a
    * user do after a view". Per user, order by time; count (from → to)
    * pairs; probability in micro units against the from-state's total.
    *
    * Scale shape: ONE user-keyed exchange for the lag window (the q141
    * physique), then a (from,to)-keyed aggregation bounded by the
    * event-type alphabet squared — the model itself is tiny no matter the
    * stream size. */
  val q144 = GraftQuery(
    "q144_markov_transitions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("to_state"))
        .withColumn("from_state", lag(col("to_state"), 1).over(w))
        .filter(col("from_state").isNotNull)
      val wf = Window.partitionBy(col("from_state"))
      pairs.groupBy(col("from_state"), col("to_state"))
        .agg(count(lit(1)).as("n"))
        .withColumn("from_total", sum(col("n")).over(wf))
        .withColumn("p_micro", expr("(n * 1000000) div from_total"))
        .orderBy(col("from_state"), col("to_state"))
    },
    Some("""WITH p AS (
        SELECT user_id, event_type AS to_state,
               lag(event_type) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS from_state
        FROM events),
      c AS (SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
            FROM p WHERE from_state IS NOT NULL
            GROUP BY from_state, to_state)
      SELECT from_state, to_state, n,
             CAST(sum(n) OVER (PARTITION BY from_state) AS BIGINT)
               AS from_total,
             (n * 1000000) // CAST(sum(n) OVER (PARTITION BY from_state)
               AS BIGINT) AS p_micro
      FROM c ORDER BY from_state, to_state"""),
    note = "behavior model: alphabet^2-bounded output, one user-keyed " +
      "exchange regardless of stream size")

  /** q145 — association-rule mining over order baskets (Agrawal & Srikant
    * 1994, the Apriori support/confidence/lift measures, here computed
    * directly for item PAIRS): which parts co-occur in an order beyond
    * chance. support = co-occurrence count, confidence = P(b|a), lift =
    * P(a,b)/(P(a)P(b)) — confidence and lift in micro units with a staged
    * (overflow-audited) integer division; the staged truncation is part
    * of the defined output on both engines.
    *
    * Scale shape: the pair generator is a self-join keyed by the ORDER
    * (fan-out bounded by basket size squared, never corpus-cross); item
    * supports are an item-keyed bounded aggregation broadcast back; the
    * top-k by lift is TakeOrderedAndProject. At 100 TB nothing but the
    * basket scan grows. */
  val q145 = GraftQuery(
    "q145_association_rules",
    (s, d) => {
      // r14 optimization: the old plan referenced the deduped basket from
      // FOUR branches (two self-join sides, item supports, order count)
      // and each re-ran the scan + (ok, pk)-distinct shuffle — per-branch
      // pushed filters defeat ReuseExchange, so nothing was shared. One
      // localCheckpoint materializes the basket once for all four
      // consumers; the dataflow itself is unchanged. (A join-free
      // restructure — collect_set per order + array-HOF pair explosion —
      // was built and MEASURED SLOWER at 1.5 s vs 1.43 s old / 1.26 s
      // this form: the per-(a,b) pair aggregation dominates this query,
      // not the basket passes, and the struct-building HOF generator
      // loses to the codegen'd self-join probe. Kept out.)
      val basket = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint()
      val nOrders = basket.select(col("ok")).distinct()
        .agg(count(lit(1)).cast("long").as("n_orders"))
      val supItem = basket.groupBy(col("pk"))
        .agg(count(lit(1)).as("sup"))
      val pairs = basket.as("a")
        .join(basket.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
        .agg(count(lit(1)).as("sup_pair"))
      pairs
        .join(broadcast(supItem.withColumnRenamed("pk", "part_a")
          .withColumnRenamed("sup", "sup_a")), Seq("part_a"))
        .join(broadcast(supItem.withColumnRenamed("pk", "part_b")
          .withColumnRenamed("sup", "sup_b")), Seq("part_b"))
        .crossJoin(broadcast(nOrders))
        .select(col("part_a"), col("part_b"),
          col("sup_pair"), col("sup_a"), col("sup_b"),
          expr("(sup_pair * 1000000) div sup_a").as("conf_micro"),
          // staged like q146/q147/dsum's overflow discipline: divide by
          // sup_a BEFORE multiplying by n_orders. Bound audit: the first
          // factor is <= 1e6 (sup_pair <= sup_a), so the largest
          // intermediate is 1e6 * n_orders — int64-safe while
          // n_orders < 9.2e12, i.e. past sf1,000,000 (the one-expression
          // form sup_pair*n_orders*1e6 overflowed once sup_pair*n_orders
          // crossed 9.2e12, reachable at large sf for a hot pair).
          expr("(((sup_pair * 1000000) div sup_a) * n_orders) div sup_b")
            .as("lift_micro"))
        .orderBy(col("lift_micro").desc, col("part_a"), col("part_b"))
        .limit(50)
    },
    Some("""WITH basket AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders
            FROM basket),
      sup AS (SELECT pk, CAST(count(*) AS BIGINT) AS sup
              FROM basket GROUP BY pk),
      pairs AS (SELECT a.pk AS part_a, b.pk AS part_b,
                  CAST(count(*) AS BIGINT) AS sup_pair
                FROM basket a JOIN basket b
                  ON a.ok = b.ok AND a.pk < b.pk
                GROUP BY a.pk, b.pk)
      SELECT part_a, part_b, sup_pair, sa.sup AS sup_a, sb.sup AS sup_b,
             (sup_pair * 1000000) // sa.sup AS conf_micro,
             (((sup_pair * 1000000) // sa.sup) * n.n_orders) // sb.sup
               AS lift_micro
      FROM pairs
        JOIN sup sa ON sa.pk = part_a
        JOIN sup sb ON sb.pk = part_b, n
      ORDER BY lift_micro DESC, part_a, part_b LIMIT 50"""),
    note = "Apriori pair rules: order-keyed self-join bounded by basket " +
      "size, supports broadcast, top-k by lift")

  /** q146 — chi-square test of independence between event type and a user
    * cohort bucket: the A/B-test significance primitive. The statistic is
    * computed entirely in integers (no float division anywhere; q107's
    * rounded-double corr is the float-discipline contrast). Per cell,
    * with d = |O·N − rt·ct| (algebraically N²·|O−E|, E = rt·ct/N):
    * contribution_micro = ((10³·d) div (rt·ct)) · ((10³·d) div N)
    * — two staged milli-precision divisions whose product is
    * 10⁶·(O−E)²/E up to the defined truncation. The staging keeps every
    * intermediate ≤ 10³·N² (int64-safe past sf100, where the naive
    * 10⁶·d² form overflows already at sf0.1), and d ≥ 0 keeps integer
    * division trunc-vs-floor-agnostic across engines. Output: every cell
    * with observed, expected_milli, contribution, and the chi2 total via
    * a window.
    *
    * Scale shape: one alphabet×buckets-bounded aggregation; marginals via
    * windows over the ≤20-row contingency table. */
  val q146 = GraftQuery(
    "q146_chi2_independence",
    (s, d) => {
      val cells = t(s, d, "events")
        .select(col("event_type"), (col("user_id") % 4).as("bucket"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("o"))
      val wr = Window.partitionBy(col("event_type"))
      val wc = Window.partitionBy(col("bucket"))
      val wAll = Window.partitionBy()
      cells
        .withColumn("rt", sum(col("o")).over(wr))
        .withColumn("ct", sum(col("o")).over(wc))
        .withColumn("n", sum(col("o")).over(wAll))
        .withColumn("expected_milli", expr("(rt * ct * 1000) div n"))
        .withColumn("contrib_micro",
          expr("((1000 * abs(o * n - rt * ct)) div (rt * ct)) * " +
            "((1000 * abs(o * n - rt * ct)) div n)"))
        .withColumn("chi2_micro", sum(col("contrib_micro")).over(wAll))
        .select(col("event_type"), col("bucket"), col("o"),
          col("expected_milli"), col("contrib_micro"), col("chi2_micro"))
        .orderBy(col("event_type"), col("bucket"))
    },
    Some("""WITH cells AS (
        SELECT event_type, user_id % 4 AS bucket,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, bucket, o,
              CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
              CAST(sum(o) OVER (PARTITION BY bucket) AS BIGINT) AS ct,
              CAST(sum(o) OVER () AS BIGINT) AS n
            FROM cells),
      c AS (SELECT event_type, bucket, o,
              (rt * ct * 1000) // n AS expected_milli,
              ((1000 * abs(o * n - rt * ct)) // (rt * ct)) *
                ((1000 * abs(o * n - rt * ct)) // n) AS contrib_micro
            FROM m)
      SELECT event_type, bucket, o, expected_milli, contrib_micro,
             CAST(sum(contrib_micro) OVER () AS BIGINT) AS chi2_micro
      FROM c ORDER BY event_type, bucket"""),
    note = "all-integer chi-square: per-cell truncation is part of the " +
      "defined output, so the statistic hash-checks exactly")

  /** q147 — Gini coefficient of customer spend: the inequality measure a
    * mixture-rebalancing pipeline uses to quantify domain concentration
    * (and the classic revenue-concentration KPI). Exact-integer form of
    * the rank formula G = (2·Σ i·x_i)/(n·Σx) − (n+1)/n over
    * ascending-sorted fixp-cents spend:
    * gini_micro = (2·10^6·Σ(i·x_i) − 10^6·(n+1)·S) div (n·S).
    *
    * Scale note: the rank window is unpartitioned but runs over the
    * CUSTOMER aggregate (dimension-sized), not the fact table — same
    * contract as q109's vocabulary ranking. At larger-than-dimension
    * cardinalities the rank would come from a range-partitioned sort +
    * partition-offset pass instead; the fact-table side here is ONE
    * hash aggregation. Overflow discipline: spend is in WHOLE currency
    * units and the micro scaling divides BEFORE multiplying
    * (t1 = 2R div n, then 10^6·t1 div S) — the direct
    * 10^6·(2R−(n+1)S) form overflows int64 already at sf0.01 in cents;
    * this staging holds to ~sf10 (headroom audited against 2^63,
    * dsum's discipline). */
  val q147 = GraftQuery(
    "q147_gini_spend",
    (s, d) => {
      val spend = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(fixp(col("o_totalprice"), 0)).as("units"))
      val w = Window.orderBy(col("units"), col("o_custkey"))
      spend
        .withColumn("i", row_number().over(w).cast("long"))
        // ranked_sum accumulates in DECIMAL: Σ i·units ≈ n²/2 · avg_units
        // crossed 2^63 at the sf100 suite (~3e19 at 20M customers —
        // ANSI long overflow, caught loudly). The per-row product i·units
        // stays a long (≤ ~1.2e13); only the dimension-sized aggregate
        // pays decimal. The downstream integral divides return BIGINT
        // (2·ranked_sum div n ≈ n·avg_units ≈ 3e12 at sf100, and the
        // ·1e6 staging keeps every later intermediate ≤ ~3e18 — ANSI
        // throws loudly if a far decade ever crosses that).
        .agg(count(lit(1)).cast("long").as("n_customers"),
          sum(col("units")).as("total_units"),
          sum((col("i") * col("units")).cast("decimal(38,0)"))
            .as("ranked_sum"))
        .select(col("n_customers"), col("total_units"),
          // the rank-weighted quotient is ~4.5e13 at sf100 (measured), so
          // its ·1e6 staging crosses 2^63 — that one product rides DECIMAL
          // (same integers, same truncation order, so values are identical
          // at every sf; everything is output-row-sized here)
          expr("(CAST((2 * ranked_sum) div n_customers AS DECIMAL(38,0)) " +
            "* 1000000) div total_units - " +
            "(1000000 * (n_customers + 1)) div n_customers")
            .as("gini_micro"))
    },
    Some("""WITH spend AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice) AS BIGINT))
                 AS BIGINT) AS units
        FROM orders GROUP BY o_custkey),
      r AS (SELECT units,
              CAST(row_number() OVER (ORDER BY units, o_custkey)
                AS BIGINT) AS i
            FROM spend),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(units) AS BIGINT) AS total_units,
              CAST(sum(i * units) AS BIGINT) AS ranked_sum
            FROM r)
      SELECT n_customers, total_units,
             ((2 * ranked_sum) // n_customers * 1000000) // total_units -
               (1000000 * (n_customers + 1)) // n_customers AS gini_micro
      FROM a"""),
    note = "exact-integer Gini over the dimension-sized spend aggregate; " +
      "fact side is one hash aggregation")

  /** q149 — trend detection by rank delta: per year, rank brands by
    * order volume; a brand's rank movement vs the previous year is the
    * "trending" signal (the corpus-curation analog: domain share drift
    * across snapshots, the q114 diff aggregated to a leaderboard).
    * Ranks are row_number with a total-order tiebreak, so the output is
    * exact; prev_rnk comes from an EXPLICIT self-join on yr-1 (not a lag
    * over observed years, which would inherit the last OBSERVED year's
    * rank for a brand that skipped a year — ADVICE r7); -1 sentinel when
    * the brand had no items in yr-1 at all.
    *
    * Scale shape: the fact join broadcasts the part dim; everything
    * after the one (year, brand)-keyed aggregation — both windows, the
    * delta — runs on a table bounded by years × brands, independent of
    * fact size. */
  val q149 = GraftQuery(
    "q149_trending_rank_delta",
    (s, d) => {
      val counts = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          col("p_brand"))
        .agg(count(lit(1)).as("n_items"))
      val wYear = Window.partitionBy(col("yr"))
        .orderBy(col("n_items").desc, col("p_brand"))
      val ranked = counts
        .withColumn("rnk", row_number().over(wYear).cast("long"))
      // self-join on the years x brands table (dimension-sized; AQE
      // broadcasts it) — strict yr-1 semantics, not last-observed-year
      val prev = ranked.select(col("p_brand"),
        (col("yr") + 1).as("yr"), col("rnk").as("py_rnk"))
      ranked.join(prev, Seq("p_brand", "yr"), "left")
        .select(col("yr"), col("p_brand"), col("n_items"), col("rnk"),
          coalesce(col("py_rnk"), lit(-1L)).as("prev_rnk"),
          coalesce(col("py_rnk") - col("rnk"), lit(0L)).as("rank_delta"))
        .orderBy(col("yr"), col("rnk"))
    },
    Some("""WITH counts AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr, p.p_brand,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2),
      r AS (SELECT yr, p_brand, n_items,
              CAST(row_number() OVER
                (PARTITION BY yr ORDER BY n_items DESC, p_brand)
                AS BIGINT) AS rnk
            FROM counts)
      SELECT r.yr, r.p_brand, r.n_items, r.rnk,
             coalesce(p.rnk, -1) AS prev_rnk,
             coalesce(p.rnk - r.rnk, 0) AS rank_delta
      FROM r LEFT JOIN r p
        ON p.p_brand = r.p_brand AND p.yr = r.yr - 1
      ORDER BY r.yr, r.rnk"""),
    note = "leaderboard drift: window + yr-1 self-join run on the " +
      "years x brands table, never the fact; part dim broadcast into " +
      "the one fact join")

  val all: Seq[GraftQuery] = Seq(q144, q145, q146, q147, q149)
}
