package graft.operators

import graft.{GraftQuery, Tables}
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over `events` — the batch twins of the Structured
  * Streaming surface (SURVEY.md §2.11): tumbling / sliding / session
  * windows, stateful first-event dedup, and JSON prop extraction (F14).
  * The streaming forms (watermarks, MemoryStream, checkpoint-resume) are
  * exercised in ScalaTest (graft.streaming); these batch twins are the
  * DuckDB-oracle-checked semantics.
  */
object EventOps {

  /** Tumbling 1-hour window aggregation — batch twin of
    * `groupBy(window($"ts", "1 hour"))` (oracle via time_bucket). */
  private val q40 = GraftQuery(
    "q40_tumbling_window_1h",
    (s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(fts(col("w.start")).as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("w_start"), col("event_type"))
    },
    Some("""SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
      event_type, count(*) AS n,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY w_start, event_type"""))

  /** Sliding 10-minute window, 5-minute slide — every event lands in
    * exactly two windows; oracle expands the two starts per event. */
  private val q41 = GraftQuery(
    "q41_sliding_window_10m_5m",
    (s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(fts(col("w.start")).as("w_start"), col("n"), col("sum_value"))
        .orderBy(col("w_start"))
    },
    Some("""WITH e AS (SELECT ts, value,
        unnest([time_bucket(INTERVAL '5 minutes', ts),
                time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS w_start
      FROM events)
      SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM e GROUP BY w_start ORDER BY w_start"""))

  /** Session windows (30-minute gap) per user — `session_window` in Spark;
    * oracle is the gaps-and-islands formulation (new session when the gap
    * from the previous event is >= the gap duration; session end = last
    * event + gap, matching Spark's session_window semantics). */
  private val q42 = GraftQuery(
    "q42_session_window_30m",
    (s, d) => {
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), ftsu(col("w.start")).as("session_start"),
          ftsu(col("w.end")).as("session_end"), col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some("""WITH x AS (SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS ns
      FROM events),
      y AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x)
      SELECT user_id,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM y GROUP BY user_id, sid ORDER BY user_id, session_start"""))

  /** JSON prop extraction (F14 — events.props carries a JSON payload like
    * the reference's profile JSON, search.py:64-74). */
  private val q43 = GraftQuery(
    "q43_json_extract_props",
    (s, d) => {
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Stateful first-event dedup — batch twin of streaming
    * `dropDuplicates("user_id","event_type")` (SURVEY §2.11): first event
    * per key in event-time order, deterministic via event_id tiebreak. */
  private val q44 = GraftQuery(
    "q44_first_event_dedup",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          ftsu(col("ts")).as("first_ts"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT user_id, event_type, event_id, first_ts FROM (
      SELECT user_id, event_type, event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** Group-collect with deterministic ordering — the reference's
    * genre → [movies] grouping (SURVEY A1, backend/routes.py:116-121).
    * The collected list is sorted and emitted as one string: array-valued
    * outputs hash differently across engines (element order), strings
    * don't. */
  private val q48 = GraftQuery(
    "q48_group_collect_sorted",
    (s, d) => {
      t(s, d, "events")
        .filter(col("user_id") < 10)
        .groupBy(col("user_id"))
        .agg(
          concat_ws(",",
            array_sort(collect_set(col("event_type")))).as("types_seen"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
      array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types_seen,
      count(*) AS n
      FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id"""))

  /** Trailing-N exclusion — the reference's "exclude the last 100 seen
    * movies from the prompt" (SURVEY W3, movie_generator.py:242): the
    * most recent 100 events form an exclusion set, anti-joined against
    * the candidate pool. */
  private val q49 = GraftQuery(
    "q49_trailing_exclusion",
    (s, d) => {
      val recent = t(s, d, "events")
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(100)
        .select(col("event_id"))
      t(s, d, "events")
        .join(broadcast(recent), Seq("event_id"), "left_anti")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_outside_recent"))
        .orderBy(col("event_type"))
    },
    Some("""WITH recent AS (
        SELECT event_id FROM events ORDER BY ts DESC, event_id DESC LIMIT 100)
      SELECT event_type, count(*) AS n_outside_recent
      FROM events WHERE event_id NOT IN (SELECT event_id FROM recent)
      GROUP BY event_type ORDER BY event_type"""))

  /** As-of (point-in-time) correlation: for every purchase, the most
    * recent prior click by the same user. Expressed as a per-user ordered
    * window carrying the last non-null click id — one shuffle on the user
    * key, no range-join blowup; the canonical as-of shape without a
    * custom SparkStrategy (guide's preference order: compose built-ins
    * first). */
    private val q53 = GraftQuery(
    "q53_asof_prior_click",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
      t(s, d, "events")
        .withColumn("prior_click_id",
          last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase")
        // null-free output: a null column round-trips as NaN/NA
        // inconsistently across engines' client layers
        .select(col("event_id"), col("user_id"), ftsu(col("ts")).as("ts_s"),
          coalesce(col("prior_click_id"), lit(-1L)).as("prior_click_id"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, ts_s, coalesce(prior_click_id, -1) AS prior_click_id FROM (
      SELECT event_id, user_id, event_type,
        strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_id
      FROM events) WHERE event_type = 'purchase' ORDER BY event_id"""))

  /** Pivot — event-type counts as columns per user (explicit value list
    * for determinism; oracle uses the equivalent CASE-sum columns). */
  private val q54 = GraftQuery(
    "q54_pivot_event_counts",
    (s, d) => {
      t(s, d, "events")
        .filter(col("user_id") < 20)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
      CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
      CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      FROM events WHERE user_id < 20 GROUP BY user_id ORDER BY user_id"""))

  /** Batch twin of StreamingOps.milestones (flatMapGroupsWithState): the
    * every-3rd-event milestone per user as a ranked-window filter — same
    * semantics, the stateful streaming form covered in StreamingSpec. */
  private val q73 = GraftQuery(
    "q73_milestones_batch",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") % 3 === 0)
        .select(col("user_id"), col("rn").as("milestone"), col("event_id"))
        .orderBy(col("user_id"), col("milestone"))
    },
    Some("""SELECT user_id, rn AS milestone, event_id FROM (
      SELECT user_id, event_id,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
      FROM events) WHERE rn % 3 = 0 ORDER BY user_id, milestone"""))

  /** Multiset set operations (SURVEY §2.7 note): INTERSECT ALL / EXCEPT
    * ALL over per-user event-type bags from two time halves. */
  private val q74 = GraftQuery(
    "q74_multiset_setops",
    (s, d) => {
      val ev = t(s, d, "events")
      val firstHalf = ev.filter(dayofmonth(col("ts")) <= 15)
        .select(col("user_id"), col("event_type"))
      val secondHalf = ev.filter(dayofmonth(col("ts")) > 15)
        .select(col("user_id"), col("event_type"))
      val common = firstHalf.intersectAll(secondHalf)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("common"))
      val firstOnly = firstHalf.exceptAll(secondHalf)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .withColumn("tag", lit("first_only"))
      common.unionByName(firstOnly)
        .select(col("tag"), col("user_id"), col("n"))
        .orderBy(col("tag"), col("user_id"))
    },
    Some("""WITH fh AS (SELECT user_id, event_type FROM events WHERE extract(day FROM ts) <= 15),
      sh2 AS (SELECT user_id, event_type FROM events WHERE extract(day FROM ts) > 15),
      common AS (SELECT user_id, count(*) AS n FROM
        (SELECT * FROM fh INTERSECT ALL SELECT * FROM sh2) GROUP BY user_id),
      fonly AS (SELECT user_id, count(*) AS n FROM
        (SELECT * FROM fh EXCEPT ALL SELECT * FROM sh2) GROUP BY user_id)
      SELECT 'common' AS tag, user_id, n FROM common
      UNION ALL SELECT 'first_only', user_id, n FROM fonly
      ORDER BY tag, user_id"""))

  /** Two-table AS-OF join via the custom sort-merge operator
    * (graft.plans.AsOfJoinExec — the §4(c) stack on an operator Spark
    * lacks): every purchase picks up the latest click at-or-before it per
    * user. q53 is the one-table window form of this shape; here left and
    * right are independent frames, which the window trick cannot express
    * without a union-tag re-shuffle of both sides. The right side is
    * pre-aggregated to one row per (user, ts) so as-of tie-break
    * ambiguity cannot enter the output (same discipline DuckDB ASOF JOIN
    * needs). Oracle: DuckDB's NATIVE ASOF LEFT JOIN — two independent
    * engines' as-of implementations must agree row-for-row. */
  private val q86 = GraftQuery(
    "q86_asof_join_two_table",
    (s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .agg(max(col("event_id")).as("c_event"))
        .select(col("c_user"), col("c_ts"), col("c_event"))
      graft.plans.AsOfJoin.asof(purchases, clicks,
          keys = Seq("user_id" -> "c_user"), "ts", "c_ts")
        .select(col("event_id"), col("user_id"), ftsu(col("ts")).as("ts_s"),
          coalesce(col("c_event"), lit(-1L)).as("c_event"),
          coalesce(ftsu(col("c_ts")), lit("-")).as("c_ts_s"))
        .orderBy(col("event_id"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'),
      c AS (SELECT user_id AS c_user, ts AS c_ts, max(event_id) AS c_event
            FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id,
        strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        coalesce(c.c_event, -1) AS c_event,
        coalesce(strftime(c.c_ts, '%Y-%m-%d %H:%M:%S.%f'), '-') AS c_ts_s
      FROM p ASOF LEFT JOIN c ON p.user_id = c.c_user AND p.ts >= c.c_ts
      ORDER BY p.event_id"""))

  /** Bucketized RANGE JOIN (SURVEY O-family scale rewrite; the interval
    * shape the brief's custom-operator list names alongside as-of): events
    * against 2-hour windows. The naive plan for `ts BETWEEN start AND end`
    * is a pair-exploding BroadcastNestedLoopJoin; the scale rewrite
    * buckets time — each window EXPLODES into every bucket it can
    * overlap, each event lands in EXACTLY ONE bucket (so every true pair
    * meets exactly once — no dedup), the join is a plain equi-join on the
    * bucket, and the precise range predicate filters map-side. At 100 TB
    * the bucket is the shuffle key.
    *
    * Bucket width is DERIVED from the value-domain stats (r12, VERDICT
    * r11 #5 — the fixed epoch-hour bucket was the slowest sf100 cell):
    * with window width W, domain span S and n events, a width-w bucketing
    * streams n·m·(W + w)/S candidate rows into the verify (each of the m
    * windows overlaps (W/w + 1) buckets of n·w/S events), while the
    * window side explodes into m·(W/w + 1) rows — the first term falls
    * and the second grows as w shrinks, crossing at w* = sqrt(W·S/n),
    * i.e. the geometric mean of the window width and the mean event gap.
    * The time domain here is FIXED while events densify (ScaleGen shifts
    * keys, never timestamps), so the candidate stream grows ~quadratically
    * per decade and the hourly constant drifts ever further from w*: at
    * sf100 (100M events / 30 days) hourly buckets carry 1.5x the true-pair
    * floor (~83B vs ~56B rows) where w* = 13.7s carries ~1.003x. Width is
    * clamped to [1s, 1h] and the stats are the memoized catalog scalars
    * (row count + ts span), so plan time pays two map lookups. Bucketing
    * never changes values — only which equi-buckets pairs meet in. */
  private val q87 = GraftQuery(
    "q87_range_join_bucketed",
    (s, d) => {
      val MicrosPerHour = 3600000000L
      val WinMicros = 2L * MicrosPerHour
      val nEv = math.max(Tables.cachedRowCount(s, d, "events"), 1L)
      val span = Tables.cachedTsSpanMicros(s, d, "events", "ts")
      val w = math.max(1000000L, math.min(MicrosPerHour,
        math.round(math.sqrt(WinMicros.toDouble * span / nEv))))
      def hb(c: org.apache.spark.sql.Column) =
        expr(s"unix_micros(${c.toString}) div ${w}L")
      val ev = t(s, d, "events")
      val win = ev.filter(col("event_id") % 499 === 0)
        .select(col("event_id").as("win_id"), col("ts").as("w_start"),
          expr("timestampadd(HOUR, 2, ts)").as("w_end"))
      val wb = win.withColumn("hb",
        explode(sequence(hb(col("w_start")), hb(col("w_end")))))
      val eb = ev.select(col("event_id"), col("ts")).withColumn("hb", hb(col("ts")))
      eb.join(wb, Seq("hb"))
        .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_ev"), max(col("event_id")).as("last_ev"))
        .orderBy(col("win_id"))
    },
    Some("""WITH w AS (SELECT event_id AS win_id, ts AS w_start,
               ts + INTERVAL 2 HOUR AS w_end
             FROM events WHERE event_id % 499 = 0)
      SELECT win_id, CAST(count(*) AS BIGINT) AS n_events,
        min(e.event_id) AS first_ev, max(e.event_id) AS last_ev
      FROM w JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
      GROUP BY win_id ORDER BY win_id"""))

  /** Time-series gap-fill + LOCF: densify per-user daily activity onto a
    * full calendar (sequence→explode, broadcast 30-row dim), fill missing
    * counts with 0, and carry the last observed daily value forward with
    * `last(_, ignoreNulls).over(rowsBetween(unboundedPreceding, current))`
    * — the resample/forward-fill primitive of telemetry pipelines. The
    * dense frame shuffles once on user_id (the window key); the calendar
    * is a broadcast nested-loop against the tiny distinct-user dim.
    * LOCF'd values are copied, never recomputed → bit-exact. */
  private val q93 = GraftQuery(
    "q93_gapfill_locf",
    (s, d) => {
      val ev = t(s, d, "events").filter(col("user_id") < 15)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("day_value"))
      val users = ev.select(col("user_id")).distinct()
      val cal = s.range(1).select(explode(sequence(
        lit("2024-01-01").cast("date"), lit("2024-01-30").cast("date"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      users.crossJoin(broadcast(cal))
        .join(ev, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          coalesce(last(col("day_value"), ignoreNulls = true).over(w),
            lit(-1.0)).as("locf_value"))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cnt"), col("locf_value"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        FROM events WHERE user_id < 15 GROUP BY 1, 2),
      users AS (SELECT DISTINCT user_id FROM ev),
      cal AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day),
      dense AS (SELECT user_id, day FROM users, cal)
      SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        CAST(coalesce(cnt, 0) AS BIGINT) AS cnt,
        coalesce(last_value(day_value IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS locf_value
      FROM dense LEFT JOIN ev USING (user_id, day)
      ORDER BY user_id, day"""))

  /** Statistical anomaly detection: z-score of each day's event count
    * against its event_type's 30-day distribution, flagging |z| >= 1.5.
    * Engine-portable because every aggregate is an INTEGER sum (count,
    * sum(cnt), sum(cnt²) — exact in any order); mean/variance/z are then
    * a fixed IEEE double op sequence over identical integers, so the
    * float threshold cannot flip membership across engines. Stats are a
    * tiny per-type broadcast; the daily rollup is the only wide shuffle. */
  private val q95 = GraftQuery(
    "q95_zscore_anomalies",
    (s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val stats = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
          sum(col("cnt") * col("cnt")).as("sq"))
      daily.join(broadcast(stats), Seq("event_type"))
        .withColumn("mean", col("s").cast("double") / col("n"))
        .withColumn("variance",
          col("sq").cast("double") / col("n") - col("mean") * col("mean"))
        .filter(col("variance") > 0)
        .withColumn("z",
          (col("cnt").cast("double") - col("mean")) / sqrt(col("variance")))
        .filter(abs(col("z")) >= 1.5)
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cnt"), round(col("z"), 6).as("z"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2),
      stats AS (
        SELECT event_type, count(*) AS n, CAST(sum(cnt) AS BIGINT) AS s,
               CAST(sum(cnt * cnt) AS BIGINT) AS sq
        FROM daily GROUP BY 1),
      scored AS (
        SELECT event_type, day, cnt,
          CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) AS variance,
          (CAST(cnt AS DOUBLE) - CAST(s AS DOUBLE) / n) /
            sqrt(CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS z
        FROM daily JOIN stats USING (event_type))
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt, round(z, 6) AS z
      FROM scored WHERE variance > 0 AND abs(z) >= 1.5
      ORDER BY event_type, day"""))

  /** Ordered funnel analysis (view → click → purchase): each step's
    * timestamp is the MIN event time strictly after the previous step's
    * and within a bounded conversion window (1 h to click, 24 h to purchase) — the sequential-conversion
    * semantics product analytics needs (a click before the first view
    * does not count, nor does one a week later). Three aggregations
    * and two joins, ALL keyed on user_id — one logical shuffle key end
    * to end, so at 100 TB the funnel is a single co-partitioned
    * pipeline. Counts are integers; the conversion ratio is one double
    * division (portable). */
  private val q97 = GraftQuery(
    "q97_funnel_view_click_purchase",
    (s, d) => {
      val ev = t(s, d, "events")
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      def cnt(df: DataFrame, step: Long, name: String) =
        df.agg(count(lit(1)).as("users"))
          .select(lit(step).as("step"), lit(name).as("step_name"), col("users"))
      val base = t1.agg(count(lit(1)).as("base"))
      cnt(t1, 1L, "view").unionByName(cnt(t2, 2L, "click"))
        .unionByName(cnt(t3, 3L, "purchase"))
        .crossJoin(broadcast(base))
        .select(col("step"), col("step_name"), col("users"),
          round(col("users").cast("double") / col("base"), 6).as("conv_from_step1"))
        .orderBy(col("step"))
    },
    Some("""WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY 1),
      t2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN t1 USING (user_id)
             WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL 1 HOUR GROUP BY 1),
      t3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN t2 USING (user_id)
             WHERE event_type = 'purchase' AND ts > t2 AND ts <= t2 + INTERVAL 24 HOURS GROUP BY 1),
      counts AS (
        SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM t1) AS users
        UNION ALL SELECT 2, 'click', (SELECT count(*) FROM t2)
        UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM t3))
      SELECT CAST(step AS BIGINT) AS step, step_name,
        CAST(users AS BIGINT) AS users,
        round(CAST(users AS DOUBLE) / (SELECT count(*) FROM t1), 6) AS conv_from_step1
      FROM counts ORDER BY step"""))

  /** Cohort retention: users grouped by first-activity day, retained if
    * active exactly 7 / 14 days later. One distinct-activity rollup and
    * one cohort join, both keyed on user_id; conditional distinct counts
    * are integers and the retention rates single double divisions. */
  private val q98 = GraftQuery(
    "q98_cohort_retention",
    (s, d) => {
      val ev = t(s, d, "events")
      val first = ev.groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("cohort"))
      val act = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      first.join(act, Seq("user_id"))
        .groupBy(col("cohort"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(col("day") === date_add(col("cohort"), 7),
            col("user_id"))).as("d7"),
          countDistinct(when(col("day") === date_add(col("cohort"), 14),
            col("user_id"))).as("d14"))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("n_users"), col("d7"), col("d14"),
          round(col("d7").cast("double") / col("n_users"), 6).as("d7_rate"),
          round(col("d14").cast("double") / col("n_users"), 6).as("d14_rate"))
        .orderBy(col("cohort"))
    },
    Some("""WITH first AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1),
      act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        CAST(count(DISTINCT CASE WHEN day = cohort + 7 THEN user_id END) AS BIGINT) AS d7,
        CAST(count(DISTINCT CASE WHEN day = cohort + 14 THEN user_id END) AS BIGINT) AS d14,
        round(CAST(count(DISTINCT CASE WHEN day = cohort + 7 THEN user_id END) AS DOUBLE)
          / count(DISTINCT user_id), 6) AS d7_rate,
        round(CAST(count(DISTINCT CASE WHEN day = cohort + 14 THEN user_id END) AS DOUBLE)
          / count(DISTINCT user_id), 6) AS d14_rate
      FROM first JOIN act USING (user_id)
      GROUP BY first.cohort ORDER BY cohort"""))

  /** q116 — semi-structured access through Spark 4's VARIANT type:
    * `parse_json` decodes each props payload ONCE into the binary
    * Variant encoding, then `variant_get` does typed path extraction
    * without re-parsing — at 100 TB the difference between parsing JSON
    * text once per row vs once per extraction (q43's
    * get_json_object re-parses the string for every path it reads).
    * Values are engine-portable (the oracle reads the same paths with
    * DuckDB's JSON functions), so the whole rollup hash-matches; only
    * the decode machinery differs. */
  private val q116 = GraftQuery(
    "q116_variant_extract",
    (s, d) => {
      val v = parse_json(col("props"))
      t(s, d, "events")
        .select((col("user_id") % 10).as("bucket"),
          variant_get(v, "$.k", "long").as("k"),
          try_variant_get(v, "$.missing", "long").as("m"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(when(col("m").isNull, 1L).otherwise(0L)).as("n_missing"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT user_id % 10 AS bucket, count(*) AS n,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      CAST(sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
      FROM events GROUP BY user_id % 10 ORDER BY bucket"""))

  /** q140 — event-time interval join (view → purchase attribution within
    * one hour, per user): the BATCH twin of a Structured Streaming
    * stream-stream join — the one §2.11 surface the engine had not yet
    * pinned. The join condition is exactly the canonical stream-stream
    * shape (equi-key on user + a two-sided time range), which is what
    * lets the streaming form bound its state: with watermarks on both
    * streams, a buffered view can be evicted one hour past the watermark.
    * [[graft.streaming.StreamingOps.intervalJoinStream]] is the streaming
    * form; StreamingSpec pins it to this query's rows batch-for-batch.
    *
    * Scale shape: ONE shuffle keyed by user_id on each side, then a
    * per-key sort-merge within the hour band — never a time-cross
    * product. Lag is emitted in exact microseconds (`unix_micros`), the
    * only cross-engine-safe timestamp arithmetic. */
  val q140 = GraftQuery(
    "q140_interval_join_attrib",
    (s, d) => {
      val ev = t(s, d, "events")
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("vts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      v.join(p, Seq("user_id"))
        .filter(col("pts") > col("vts") &&
          col("pts") <= col("vts") + expr("INTERVAL 1 HOUR"))
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          (unix_micros(col("pts")) - unix_micros(col("vts"))).as("lag_us"))
        .orderBy(col("user_id"), col("view_id"), col("purchase_id"))
    },
    Some("""SELECT v.user_id, v.event_id AS view_id,
             p.event_id AS purchase_id,
             epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
      FROM events v JOIN events p ON p.user_id = v.user_id
      WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      ORDER BY v.user_id, view_id, purchase_id"""),
    note = "batch twin of the stream-stream interval join " +
      "(StreamingOps.intervalJoinStream); StreamingSpec pins parity")

  /** q141 — SCD Type-2 history build (Kimball's slowly-changing-dimension
    * pattern): turn a change-event stream into versioned dimension rows
    * with validity intervals — the standard warehouse maintenance op that
    * complements q14's SCD1 last-writer-wins. Per user, consecutive
    * duplicate states collapse; each surviving change opens a version
    * whose `valid_to_us` is the next change's timestamp (-1 sentinel =
    * current row, per the null-free house rule).
    *
    * Scale shape: ONE shuffle keyed by the dimension key; the
    * change-detect lag, interval lead, and version number all ride the
    * same (user_id | ts) sort order, so both Window nodes sit over that
    * one Exchange — no per-window re-shuffle (plan-audited; the only
    * other Exchange is the output sort). */
  val q141 = GraftQuery(
    "q141_scd2_history_build",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes
        .withColumn("valid_from_us", unix_micros(col("ts")))
        .withColumn("valid_to_us",
          coalesce(unix_micros(lead(col("ts"), 1).over(w)), lit(-1L)))
        .withColumn("version", row_number().over(w).cast("long"))
        .select(col("user_id"), col("version"),
          col("event_type").as("state"),
          col("valid_from_us"), col("valid_to_us"),
          (col("valid_to_us") === -1L).as("is_current"))
        .orderBy(col("user_id"), col("version"))
    },
    Some("""WITH m AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      c AS (SELECT user_id, event_id, ts, event_type FROM m
            WHERE prev IS NULL OR prev <> event_type),
      v AS (SELECT user_id, event_type AS state,
              epoch_us(ts) AS valid_from_us,
              coalesce(epoch_us(lead(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)), -1)
                AS valid_to_us,
              CAST(row_number() OVER
                (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                AS version
            FROM c)
      SELECT user_id, version, state, valid_from_us, valid_to_us,
             valid_to_us = -1 AS is_current
      FROM v ORDER BY user_id, version"""),
    note = "SCD2 dimension maintenance: one user-keyed exchange, all " +
      "three windows share its sort; -1 sentinel keeps the output null-free")

  /** q153 — rate-limited interval-join attribution: q140 with the
    * HOT-KEY DEFENSE composed IN FRONT of the join (VERDICT r7 #4 —
    * ROUND7 §15 diagnosed q140's one genuine hot-key hazard: the
    * interval join's output and its no-broadcast shuffle state grow as
    * views × purchases PER USER inside the hour window, so a bot user
    * spamming views makes the hot partition quadratic in its rate, and
    * no join-side skew handling can absorb OUTPUT growth). The remedy
    * the round-7 analysis named — upstream rate-limit/dedup — is q44's
    * first-event dedup generalized to a time bucket: keep only the
    * FIRST view per (user, 10-minute bucket) in event-time order
    * (event_id tiebreak), bounding every user's join fan-in to at most
    * one view per 10-minute bucket — ≤ 7 views per attribution hour
    * (an hour window can clip partial buckets at both ends) REGARDLESS
    * of raw rate, before any pair is formed. Purchases are never
    * discarded (the money side).
    *
    * Scale shape: the dedup is one (user, bucket)-keyed window over the
    * view stream (output ≤ 1 row per key), then q140's user-keyed
    * interval join — the hot key's pair count is now rate-independent.
    * Streaming form: [[graft.streaming.StreamingOps
    * .defendedIntervalJoinStream]] (dropDuplicatesWithinWatermark on the
    * same key in front of the same stream-stream join; StreamingSpec
    * pins parity on ordered replay). */
  val q153 = GraftQuery(
    "q153_rate_limited_attrib",
    (s, d) => {
      val ev = t(s, d, "events")
      val wb = Window
        .partitionBy(col("user_id"), col("vbucket"))
        .orderBy(col("ts"), col("event_id"))
      val v = ev.filter(col("event_type") === "view")
        .withColumn("vbucket", expr("unix_micros(ts) div 600000000"))
        .withColumn("rn", row_number().over(wb))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("vts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      v.join(p, Seq("user_id"))
        .filter(col("pts") > col("vts") &&
          col("pts") <= col("vts") + expr("INTERVAL 1 HOUR"))
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          (unix_micros(col("pts")) - unix_micros(col("vts"))).as("lag_us"))
        .orderBy(col("user_id"), col("view_id"), col("purchase_id"))
    },
    Some("""WITH v AS (
        SELECT user_id, event_id AS view_id, ts AS vts FROM (
          SELECT user_id, event_id, ts,
                 row_number() OVER
                   (PARTITION BY user_id, epoch_us(ts) // 600000000
                    ORDER BY ts, event_id) AS rn
          FROM events WHERE event_type = 'view')
        WHERE rn = 1)
      SELECT v.user_id, v.view_id, p.event_id AS purchase_id,
             epoch_us(p.ts) - epoch_us(v.vts) AS lag_us
      FROM v JOIN events p ON p.user_id = v.user_id
      WHERE p.event_type = 'purchase' AND p.ts > v.vts
        AND p.ts <= v.vts + INTERVAL 1 HOUR
      ORDER BY v.user_id, view_id, purchase_id"""),
    note = "q140 with upstream rate-limit: first view per (user, 10-min " +
      "bucket) bounds the hot user's pair growth before the join; " +
      "streaming form = StreamingOps.defendedIntervalJoinStream")

  val all: Seq[GraftQuery] = Seq(q40, q41, q42, q43, q44, q48, q49, q53,
    q54, q73, q74, q86, q87, q93, q95, q97, q98, q116, q140, q141, q153)
}
