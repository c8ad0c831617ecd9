package graft.operators

import graft.{GraftQuery, Tables}
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational capability family over the TPC-H-ish harness tables:
  * scan/filter/project/limit (SURVEY.md §2.1-§2.2), joins incl. broadcast /
  * semi / anti (§2.3), aggregations (§2.4), windows (§2.5), top-k (§2.6),
  * set ops (§2.7).
  *
  * Scale notes (100 TB honesty): filters are written before joins/sorts so
  * Catalyst pushes them into the parquet scan; small dims (region, nation,
  * supplier) are broadcast explicitly; every top-k is `orderBy().limit()`
  * (TakeOrderedAndProject — per-partition heaps, no global sort); windows
  * are partitioned by high-cardinality keys except the deliberate
  * ratio-to-total demo.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (reference analog: status-group
    * telemetry, backend/database.py:18-19 done as one pass — SURVEY A8). */
  private val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          round(dsum(col("l_quantity")) / count(lit(1)), 6)
            .as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      count(*) AS count_order,
      round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** Filter+project+top-k; predicates push to the parquet scan (SURVEY P1,
    * O1-O3), top-k via TakeOrderedAndProject (T1). */
  private val q02 = GraftQuery(
    "q02_filter_project_topk",
    (s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          dec(col("l_extendedprice")).cast("double").as("price"),
          dec(col("l_discount")).cast("double").as("disc"))
        .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },
    Some("""SELECT l_orderkey, l_linenumber,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS disc
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100"""))

  /** 3-way equi-join revenue rollup (capability join, SURVEY §2.3):
    * lineitem ⋈ orders shuffles on the join key; customer side is the
    * smaller input and AQE picks the strategy. */
  private val q03 = GraftQuery(
    "q03_join_revenue_by_segment",
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
      val l = t(s, d, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment,
      CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Broadcast dimension join chain region⋈nation⋈customer (SURVEY §2.3,
    * O6): both dims are broadcast — zero shuffle on the fact side until
    * the final (tiny) aggregation. */
  private val q04 = GraftQuery(
    "q04_broadcast_region_rollup",
    (s, d) => {
      val r = t(s, d, "region")
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, count(*) AS n_customers,
      CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** Left-semi join — the reference's "already seen" membership check
    * (movie_generator.py:201-204; SURVEY U1 dual). */
  private val q05 = GraftQuery(
    "q05_semi_join_active_buyers",
    (s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 150000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
        .limit(500)
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
      ORDER BY c_custkey LIMIT 500"""))

  /** Left-anti join per nation — the "not yet seen" exclusion
    * (movie_generator.py:201-204 negation; SURVEY U1). */
  private val q06 = GraftQuery(
    "q06_anti_join_inactive",
    (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 400000)
      val n = t(s, d, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_inactive"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name, count(*) AS n_inactive
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      GROUP BY n_name ORDER BY n_name"""))

  /** Top-3-per-group via ranked window (SURVEY W1/T1 generalized);
    * partitioned by high-cardinality custkey → scales. */
  private val q07 = GraftQuery(
    "q07_top3_orders_per_customer",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          dec(col("o_totalprice")).cast("double").as("price"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, rn, o_orderkey, price FROM (
      SELECT o_custkey, o_orderkey,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** Running per-user sum with an explicit rows frame (SURVEY §2.5 frame
    * demo); fixed-point LONG accumulation (fixp) keeps the running sum
    * bit-exact — same contract as the decimal oracle twin, cheaper agg. */
  private val q08 = GraftQuery(
    "q08_running_sum_per_user",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("running_value",
          sum(fixp(col("value"))).over(w).cast("double") / lit(100.0))
        .select(col("user_id"), col("event_id"), ftsu(col("ts")).as("ts_s"),
          col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
      strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
      CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      FROM events ORDER BY user_id, event_id"""))

  /** Ratio-to-total via empty-frame window — the reference's confidence
    * metric len(group)/len(all) (backend/routes.py:132; SURVEY A3/W4). */
  private val q09 = GraftQuery(
    "q09_ratio_to_total",
    (s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("confidence",
          round(col("cnt").cast("double") / sum(col("cnt")).over(Window.partitionBy()), 6))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS cnt,
      round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (), 6) AS confidence
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** min/max range string per group — the reference's year-range
    * (backend/routes.py:80,85; SURVEY A4 + F9). */
  private val q10 = GraftQuery(
    "q10_minmax_range",
    (s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          concat_ws("..", fdate(min(col("o_orderdate"))), fdate(max(col("o_orderdate"))))
            .as("date_range"),
          count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
      strftime(min(o_orderdate), '%Y-%m-%d') || '..' || strftime(max(o_orderdate), '%Y-%m-%d') AS date_range,
      count(*) AS cnt
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** ROLLUP grouping-sets capability (SURVEY §2.4 note). */
  private val q11 = GraftQuery(
    "q11_rollup_counts",
    (s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      count(*) AS cnt, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls"""))

  /** INTERSECT / EXCEPT set ops (SURVEY §2.7) over customer vs supplier
    * nations, tagged and unioned into one deterministic result. */
  private val q12 = GraftQuery(
    "q12_setops_nations",
    (s, d) => {
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      val custN = t(s, d, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name")).distinct()
      val suppN = t(s, d, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name")).distinct()
      val both = custN.intersect(suppN).withColumn("tag", lit("both"))
      val custOnly = custN.except(suppN).withColumn("tag", lit("cust_only"))
      both.unionByName(custOnly).select(col("tag"), col("n_name"))
        .orderBy(col("tag"), col("n_name"))
    },
    Some("""WITH cn AS (SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
      sn AS (SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
      SELECT 'both' AS tag, n_name FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
      UNION ALL
      SELECT 'cust_only' AS tag, n_name FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn)
      ORDER BY tag, n_name"""))

  /** Deterministic distinct top-3 (reference's nondeterministic Python-set
    * genre pick made deterministic — routes.py:81-86; SURVEY A5). */
  private val q13 = GraftQuery(
    "q13_top3_event_types",
    (s, d) => {
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("event_type"))
        .limit(3)
    },
    Some("""SELECT event_type, count(*) AS cnt FROM events
      GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3"""))

  /** Last-writer-wins merge key dedup — the reference's upsert semantics
    * (movie_generator.py:452-467; SURVEY S5/W2): latest order per customer. */
  private val q14 = GraftQuery(
    "q14_last_writer_wins",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          fdate(col("o_orderdate")).as("latest_date"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, latest_date FROM (
      SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) WHERE rn = 1 ORDER BY o_custkey"""))

  /** count + count-distinct per group (SURVEY S2/A8). */
  private val q15 = GraftQuery(
    "q15_count_distinct_per_nation",
    (s, d) => {
      val n = t(s, d, "nation")
      t(s, d, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          countDistinct(col("c_mktsegment")).as("n_segments"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name, count(*) AS n_customers,
      count(DISTINCT c_mktsegment) AS n_segments
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  /** Per-type part stats with exact-decimal avg (SURVEY A1-A2 analog). */
  private val q16 = GraftQuery(
    "q16_part_type_stats",
    (s, d) => {
      t(s, d, "part")
        .groupBy(col("p_type"))
        .agg(
          count(lit(1)).as("cnt"),
          round(dsum(col("p_retailprice")) / count(lit(1)), 6)
            .as("avg_price"),
          max(col("p_size")).as("max_size"))
        .orderBy(col("p_type"))
    },
    Some("""SELECT p_type, count(*) AS cnt,
      round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
      max(p_size) AS max_size
      FROM part GROUP BY p_type ORDER BY p_type"""))

  /** Supplier volume via broadcast fact⋈dim join (SURVEY §2.3). */
  private val q17 = GraftQuery(
    "q17_supplier_volume",
    (s, d) => {
      val sup = t(s, d, "supplier")
      t(s, d, "lineitem")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_items"))
        .orderBy(col("s_name"))
    },
    Some("""SELECT s_name, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      count(*) AS n_items
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name ORDER BY s_name"""))

  /** Paged scan — the reference's find().skip(m).limit(n) (SURVEY S1,
    * backend/database.py:49-54), deterministic via explicit total order. */
  private val q27 = GraftQuery(
    "q27_scan_pagination",
    (s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          dec(col("o_totalprice")).cast("double").as("price"))
        .orderBy(col("o_orderkey"))
        .offset(100)
        .limit(20)
    },
    Some("""SELECT o_orderkey, o_custkey,
      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 100"""))

  /** Full CUBE grouping sets over two dimensions (SURVEY §2.4 note). */
  private val q51 = GraftQuery(
    "q51_cube_counts",
    (s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("cnt"), col("sum_price"))
        .orderBy(col("status"), col("priority"))
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
      coalesce(o_orderpriority, 'ALL') AS priority,
      count(*) AS cnt,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))

  /** Value-range window frame (SURVEY §2.5 frame specs): per-status sum of
    * all orders within $10,000 below the current order's price. */
  private val q52 = GraftQuery(
    "q52_range_frame_window",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000L, Window.currentRow)
      t(s, d, "orders")
        .filter(col("o_custkey") < 50)
        .withColumn("near_sum", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_orderstatus"), col("o_orderkey"),
          dec(col("o_totalprice")).cast("double").as("price"), col("near_sum"))
        .orderBy(col("o_orderstatus"), col("price"), col("o_orderkey"))
    },
    Some("""SELECT o_orderstatus, o_orderkey,
      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_orderstatus ORDER BY o_totalprice
        RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum
      FROM orders WHERE o_custkey < 50
      ORDER BY o_orderstatus, price, o_orderkey"""))

  /** Exact interpolated percentiles per group — Spark `percentile` and
    * DuckDB `quantile_cont` share linear-interpolation semantics; outputs
    * rounded to 4dp to absorb the one interpolation op's last-ulp drift. */
  /** Exact interpolated percentiles via SORT-BASED rank selection, not
    * the `percentile()` aggregate: Spark's exact Percentile buffers an
    * OpenHashMap of every distinct group value in the agg buffer — an
    * OOM hazard once a single group holds ~1e8+ distinct values, which
    * is exactly the 100 TB shape. The window sort path spills through
    * UnsafeExternalSorter instead, and the groupBy reuses the window's
    * hash partitioning (ONE shuffle total). Interpolation reproduces
    * Percentile.getPercentile's exact IEEE form — lower + (higher -
    * lower)·frac over the two bracketing ranks — which is what the
    * DuckDB quantile_cont twin already hash-matched against. */
  private val q55 = GraftQuery(
    "q55_percentiles",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("v"))
      val wn = Window.partitionBy(col("o_orderstatus"))
      val ranked = t(s, d, "orders")
        .select(col("o_orderstatus"), col("o_totalprice").cast("double").as("v"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
      def pct(p: Double): Column = {
        val pos = (col("n") - 1).cast("double") * p
        val f = floor(pos)
        val vf = max(when(col("rn") === f + 1, col("v")))
        val vc = max(when(col("rn") === ceil(pos) + 1, col("v")))
        // coalesce: when pos is integral, ceil row == floor row and the
        // frac term is exactly 0 — vf alone is the answer
        vf + (coalesce(vc, vf) - vf) * max(pos - f)
      }
      ranked.groupBy(col("o_orderstatus"))
        .agg(round(pct(0.5), 4).as("p50"), round(pct(0.9), 4).as("p90"),
          count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
      round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      count(*) AS cnt
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Navigation window functions: lag / lead / ntile per user over
    * event time (SURVEY §2.5 breadth; deterministic via total order). */
  private val q58 = GraftQuery(
    "q58_lag_lead_ntile",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"),
          coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_id"),
          coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_id"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
      coalesce(lag(event_id, 1) OVER w, -1) AS prev_id,
      coalesce(lead(event_id, 1) OVER w, -1) AS next_id,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile
      FROM events WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id"""))

  /** String-function breadth (SURVEY §2.9 F9/F12 beyond the pipeline's
    * own needs): pad / translate / reverse / repeat / position / case. */
  private val q59 = GraftQuery(
    "q59_string_functions",
    (s, d) => {
      t(s, d, "part")
        .select(
          col("p_partkey"),
          lpad(col("p_brand"), 12, "_").as("brand_pad"),
          translate(col("p_name"), "aeiou", "AEIOU").as("consonantized"),
          reverse(col("p_type")).as("type_rev"),
          concat(repeat(lit("*"), col("p_size") % 5), upper(col("p_name"))).as("starred"),
          instr(col("p_name"), "e").cast("long").as("first_e"),
          concat(upper(substring(col("p_name"), 1, 1)), substring(col("p_name"), 2, 1000))
            .as("cap_first"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey,
      lpad(p_brand, 12, '_') AS brand_pad,
      translate(p_name, 'aeiou', 'AEIOU') AS consonantized,
      reverse(p_type) AS type_rev,
      repeat('*', CAST(p_size % 5 AS INT)) || upper(p_name) AS starred,
      CAST(strpos(p_name, 'e') AS BIGINT) AS first_e,
      upper(substr(p_name, 1, 1)) || substr(p_name, 2, 1000) AS cap_first
      FROM part ORDER BY p_partkey"""))

  /** Date/time-function breadth (SURVEY §2.9 F10): trunc, extract parts,
    * day arithmetic, month bucketing. */
  private val q67 = GraftQuery(
    "q67_date_functions",
    (s, d) => {
      t(s, d, "orders")
        .groupBy(
          fdate(date_trunc("month", col("o_orderdate"))).as("order_month"),
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"))
        .agg(
          count(lit(1)).as("n"),
          max(dayofmonth(col("o_orderdate"))).cast("long").as("max_dom"),
          max(datediff(col("o_orderdate"), lit("1995-01-01").cast("date")))
            .cast("long").as("max_days_since_epoch0"))
        .orderBy(col("order_month"))
    },
    Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
      CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
      CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS q,
      count(*) AS n,
      CAST(max(extract(day FROM o_orderdate)) AS BIGINT) AS max_dom,
      CAST(max(date_diff('day', DATE '1995-01-01', o_orderdate)) AS BIGINT) AS max_days_since_epoch0
      FROM orders GROUP BY 1, 2, 3 ORDER BY order_month"""))

  /** 6-table star join (the TPC-H Q5 shape): revenue per nation for one
    * region and order-year, with local suppliers (customer and supplier
    * share a nation). Exercises Catalyst's join reordering + broadcast
    * selection across a dim chain (region→nation tiny, customer/supplier
    * medium, orders filtered, lineitem fact) — the optimizer, not the
    * author, decides the join tree; PlanSpec asserts dims broadcast. */
  private val q88 = GraftQuery(
    "q88_star_join_q5",
    (s, d) => {
      val o = t(s, d, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      t(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY n_name"""))

  /** Window-function breadth beyond frames/lag/ntile (SURVEY §2.5):
    * percent_rank, cume_dist, nth_value, dense_rank in one pass. The
    * rank-family outputs are int/int-derived doubles — bit-exact. */
  private val q89 = GraftQuery(
    "q89_window_rank_family",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, d, "customer")
        .filter(col("c_nationkey") < 5)
        .select(col("c_nationkey"), col("c_custkey"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          dense_rank().over(w).cast("long").as("drank"),
          coalesce(nth_value(col("c_custkey"), 3).over(
            Window.partitionBy(col("c_nationkey"))
              .orderBy(col("c_acctbal"), col("c_custkey"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            lit(-1L)).as("third_key"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },
    Some("""SELECT c_nationkey, c_custkey,
      round(percent_rank() OVER w, 6) AS pct_rank,
      round(cume_dist() OVER w, 6) AS cume,
      CAST(dense_rank() OVER w AS BIGINT) AS drank,
      coalesce(nth_value(c_custkey, 3) OVER
        (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS third_key
      FROM customer WHERE c_nationkey < 5
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      ORDER BY c_nationkey, c_custkey"""))

  /** UNPIVOT (melt): wide part metrics → long (metric, value) rows via
    * the Dataset.unpivot operator — a narrow per-row expansion (Expand
    * node, no shuffle). Both metrics cast to a common DOUBLE; values are
    * copied, not computed, so equality is bit-exact. DuckDB oracle uses
    * the equivalent UNION ALL form. */
  private val q92 = GraftQuery(
    "q92_unpivot_part_metrics",
    (s, d) => {
      t(s, d, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))
    },
    Some("""SELECT p_partkey, metric, value FROM (
        SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part)
      ORDER BY p_partkey, metric"""))

  /** Equal-width histogram of order totals: 10 buckets spanning the
    * observed [min, max]. The bucket function is one fixed IEEE double
    * op sequence over identical inputs (stored doubles, broadcast
    * min/max) so bucket membership is engine-portable even for values
    * landing exactly on a boundary; the bucket stats themselves are
    * a count plus DECIMAL-routed sums. Min/max are a 1-row broadcast;
    * the histogram is one partial+final aggregation over the scan. */
  private val q96 = GraftQuery(
    "q96_histogram_totalprice",
    (s, d) => {
      val o = t(s, d, "orders")
      val mm = o.agg(min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(mm))
        .withColumn("bucket",
          least(lit(9L), floor((col("o_totalprice") - col("mn")) /
            ((col("mx") - col("mn")) / lit(10.0)))))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("bucket"))
    },
    Some("""WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
        FROM orders)
      SELECT least(9, CAST(floor((o_totalprice - mn) / ((mx - mn) / 10.0)) AS BIGINT)) AS bucket,
        count(*) AS cnt,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders, mm
      GROUP BY 1 ORDER BY bucket"""))

  /** PIVOT (wide crosstab): revenue by status × order-year, the inverse
    * of q92's unpivot. Compiled to conditional aggregates (one
    * `sum(when(year = v))` per listed value) rather than
    * `Dataset.pivot`: the built-in pivot plans TWO aggregations — a
    * (status, year) pre-agg shuffle, then a pivotfirst shuffle on
    * status — while the conditional form is ONE partial+final
    * aggregation over the scan, the same plan DuckDB compiles PIVOT to.
    * The explicit value list is part of the operator contract (an
    * unlisted-values pivot needs a distinct-scan first by definition).
    * Sums ride DECIMAL for bit-exact cross-engine totals; absent cells
    * coalesce to 0. */
  private val q101 = GraftQuery(
    "q101_pivot_revenue_matrix",
    (s, d) => {
      val yrs = 1995 to 2001
      val y = year(col("o_orderdate"))
      val cells = yrs.map { v =>
        coalesce(sum(when(y === v, dec(col("o_totalprice")))).cast("double"),
          lit(0.0)).as(s"y$v")
      }
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(cells.head, cells.tail: _*)
        .orderBy(col("o_orderstatus"))
    },
    Some {
      val cells = (1995 to 2001).map(y =>
        s"""coalesce(CAST(sum(CASE WHEN year(o_orderdate) = $y
           THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
           AS y$y""").mkString(",\n        ")
      s"""SELECT o_orderstatus,
        $cells
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
    })

  /** Statistical aggregates — per-group Pearson correlation and sample
    * covariance of quantity vs discount, built from the five exact
    * integer sums (n, Σx, Σy, Σxy, Σx², Σy²) rather than the engines'
    * native corr()/covar_samp() (whose accumulation order differs across
    * engines and partitionings, breaking hash parity AND run-to-run
    * determinism at cluster scale). Discount is scaled to integer
    * percent first (2dp data), so every sum is a BIGINT with headroom
    * for ~1e12 rows; the closed-form corr/cov are then one fixed IEEE
    * op sequence over identical integers — bit-exact everywhere. One
    * partial+final aggregation over the scan. */
  private val q107 = GraftQuery(
    "q107_corr_qty_discount",
    (s, d) => {
      val x = col("l_quantity").cast("long")
      val y = round(col("l_discount") * 100).cast("long")
      val stats = t(s, d, "lineitem")
        .select(col("l_returnflag"), x.as("x"), y.as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      // Sums are exact BIGINTs, but a PRODUCT of two sums exceeds int64
      // (non-ANSI silent wraparound) once a group nears ~1e9 rows. Cast
      // each sum to double BEFORE multiplying — exactly what the SQL twin
      // does — so products are IEEE ops over sums that are themselves
      // < 2^53 (exact as doubles): bit-identical across engines AND safe
      // at the row counts the headroom comment above claims.
      val n = col("n").cast("double")
      val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
      val sxy = col("sxy").cast("double")
      val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
      val cov = (sxy - sx * sy / n) / (n - lit(1.0))
      val corr = (n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
      stats.select(col("l_returnflag"), col("n"),
          round(corr, 6).as("corr_qty_disc"),
          round(cov, 6).as("cov_qty_disc"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH s AS (SELECT l_returnflag, count(*) AS n,
        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(x * y) AS BIGINT) AS sxy,
        CAST(sum(x * x) AS BIGINT) AS sxx,
        CAST(sum(y * y) AS BIGINT) AS syy
      FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
              CAST(round(l_discount * 100) AS BIGINT) AS y FROM lineitem)
      GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
          (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
           sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
          AS corr_qty_disc,
        round((sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1), 6)
          AS cov_qty_disc
      FROM s ORDER BY l_returnflag"""))

  /** q143 — incremental aggregate maintenance (the materialized-view
    * refresh pattern): a stored aggregate STATE (orders before the cutoff)
    * absorbs a DELTA batch (orders at/after it) by merging algebraic
    * partials — counts add, fixed-point sums add, min/max combine — and
    * the merged result must equal the full recompute, which is exactly
    * what the oracle twin computes. At 100 TB this is the difference
    * between re-scanning the fact table per refresh and touching ONLY the
    * new batch: state is group-bounded (5 rows here), the delta scan is
    * the only fact-sized work, and the merge is a 2×groups union-agg.
    * The revenue partial stays in fixp long units (q01's exact
    * fixed-point discipline) until AFTER the merge, so partial+final is
    * bit-identical to the one-shot decimal sum. Non-algebraic aggregates
    * (distinct counts) need sketches instead — that path is q122's HLL.
    */
  private val q143 = GraftQuery(
    "q143_incremental_agg_merge",
    (s, d) => {
      val cutoff = "1998-01-01"
      val orders = t(s, d, "orders")
      def partials(df: DataFrame): DataFrame =
        df.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(fixp(col("o_totalprice"))).as("rev_c"),
            min(col("o_totalprice")).as("mn"),
            max(col("o_totalprice")).as("mx"))
      val state = partials(orders.filter(col("o_orderdate") < lit(cutoff)))
      val delta = partials(orders.filter(col("o_orderdate") >= lit(cutoff)))
      state.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).as("n_orders"),
          (sum(col("rev_c")).cast("double") / 100).as("revenue"),
          min(col("mn")).as("min_price"), max(col("mx")).as("max_price"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    note = "state+delta partial merge must equal the oracle's full " +
      "recompute — the refresh-correctness contract of incremental view " +
      "maintenance")

  val all: Seq[GraftQuery] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q16, q17, q27, q51, q52, q55,
    q58, q59, q67, q88, q89, q92, q96, q101, q107, q143)
}
