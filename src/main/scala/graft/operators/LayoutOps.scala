package graft.operators

import graft.GraftQuery
import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side half of scan performance. At
  * 100 TB the fastest scan is the one that never happens: parquet footers
  * carry per-file min/max stats, and a reader prunes files whose stat
  * range misses the predicate. Single-column range layout (Spark's
  * `repartitionByRange` + in-partition sort) makes ONE column prunable;
  * multi-dimensional workloads (filter by part AND supplier) need an
  * interleaved order so EVERY clustered column's per-file range stays
  * narrow. That is Z-ordering (Morton 1966; the public Delta/Iceberg
  * `OPTIMIZE ZORDER BY` pattern), and it composes from Spark primitives:
  * compute the Morton code, `repartitionByRange(z)`, write.
  *
  * q135 is the AUDIT query of that layout: assign each row its Z-bucket
  * (the would-be file) and emit the per-bucket min/max stats a parquet
  * writer would put in footers. The Morton invariant — a bucket spanning
  * 2^26 codes confines BOTH 16-bit dims to 2^13-wide ranges — is what
  * makes every bucket prunable on either dimension; the spread between
  * `x_span·y_span` and the full domain is the measured skipping power.
  * The code is pure integer div/mod arithmetic generated from one Scala
  * loop for both engines, so the audit hash-checks bit-for-bit.
  */
object LayoutOps {

  private val Bits = 16
  /** Morton interleave of two Bits-bit ints x,y as integer arithmetic —
    * `intDiv` is "div" (Spark) or "//" (DuckDB); both sides of the oracle
    * pair are generated from this one loop so they cannot drift. */
  private def zTerms(intDiv: String): String =
    (0 until Bits).map { i =>
      s"((x $intDiv ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"((y $intDiv ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Z-bucket width: top 6 of 32 interleaved bits index the bucket, so a
    * bucket confines each dim to a 2^13-wide range. */
  private val BucketCodes = 1L << 26

  /** Morton code of 16-bit grid columns named `x`,`y` — the write-path
    * sort key: `df.repartitionByRange(n, zCol).sortWithinPartitions(zCol)`
    * then write; ScaleSpec asserts the resulting per-file min/max
    * footprints narrow on BOTH dims vs an arrival-order write. */
  def zCol: org.apache.spark.sql.Column = expr(zTerms("div"))

  val q135 = GraftQuery(
    "q135_zorder_layout_audit",
    (s, d) => {
      // min-max scale each key to the full 16-bit Morton grid (the
      // range-id normalization real Z-order writers apply) so bucket
      // occupancy is sf-independent; the stats agg is one tiny broadcast
      val base = t(s, d, "lineitem")
        .select(col("l_partkey").as("px"), col("l_suppkey").as("py"))
      val stats = base.agg(max(col("px")).as("mx"), max(col("py")).as("my"))
      val xy = base.crossJoin(broadcast(stats))
        .selectExpr("(px * 65536) div (mx + 1) AS x",
          "(py * 65536) div (my + 1) AS y")
      xy.withColumn("z", expr(zTerms("div")))
        .withColumn("bucket", expr(s"z div $BucketCodes"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .withColumn("x_span", col("max_x") - col("min_x") + 1)
        .withColumn("y_span", col("max_y") - col("min_y") + 1)
        .orderBy(col("bucket"))
    },
    Some(s"""WITH st AS (SELECT max(l_partkey) AS mx, max(l_suppkey) AS my
                  FROM lineitem),
        xy AS (SELECT (l_partkey * 65536) // (mx + 1) AS x,
                   (l_suppkey * 65536) // (my + 1) AS y FROM lineitem, st),
        zz AS (SELECT x, y, ${zTerms("//")} AS z FROM xy),
        b AS (SELECT z // $BucketCodes AS bucket, x, y FROM zz)
      SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y,
             max(x) - min(x) + 1 AS x_span,
             max(y) - min(y) + 1 AS y_span
      FROM b GROUP BY bucket ORDER BY bucket"""),
    note = "Morton-code layout audit: per-Z-bucket min/max = the parquet " +
      "footer stats multi-dim file skipping prunes on; write path is " +
      "repartitionByRange(z)")

  /** Compaction target bin size (bytes of the integer size model). */
  val CompactionTarget = 1L << 20

  /** File inventory of a fragmented streaming ingest, derived
    * deterministically from the events stream: one "file" per 10-minute
    * ingest bucket (the one-file-per-micro-batch pattern that creates
    * the small-file problem), sized by an exact integer model
    * (40 bytes/row framing + payload string lengths) so both engines
    * agree bit-for-bit. Shared by q152 and ScaleSpec's materialized
    * compaction test. */
  def fileInventory(s: org.apache.spark.sql.SparkSession,
                    d: String): org.apache.spark.sql.DataFrame =
    t(s, d, "events")
      .groupBy(expr("unix_micros(ts) div 600000000").as("file_id"))
      .agg((count(lit(1)) * 40 + sum(length(col("event_type"))) +
        sum(length(col("props")))).cast("long").as("bytes"),
        count(lit(1)).as("n_rows"))

  /** Per-file bin assignment: sorted next-fit-decreasing — files ordered
    * by bytes DESC (file_id tiebreak), bin = exclusive running total
    * div target. This is the greedy pass a Delta/Iceberg-style
    * `OPTIMIZE` bin-packing compaction performs, expressed as ONE
    * window over the FILE INVENTORY (bounded by ingest buckets /
    * manifest size, never fact-sized — the q109/q147 unpartitioned-
    * window contract; a real table format reads this from its manifest).
    * Packing guarantee: each bin's total < target + its largest file. */
  def compactionPlan(s: org.apache.spark.sql.SparkSession,
                     d: String): org.apache.spark.sql.DataFrame = {
    val w = Window.orderBy(col("bytes").desc, col("file_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fileInventory(s, d)
      .withColumn("prior", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"prior div $CompactionTarget"))
  }

  /** q152 — small-file compaction audit (VERDICT r7 #6): the third
    * classic warehouse-maintenance write op next to Z-order (q135) and
    * incremental agg merge (q143). Emits the compaction plan's per-bin
    * summary with the packing bound checked IN-QUERY (the q122/q152
    * gate discipline: `within_bound` = total < target + largest file —
    * provably always true for sorted next-fit, so a violation flips the
    * boolean and fails the hash gate). ScaleSpec materializes the plan
    * (repartition by bin + partitionBy write) and asserts the physical
    * layout matches: one file per bin, per-bin row counts equal. */
  val q152 = GraftQuery(
    "q152_compaction_binpack",
    (s, d) => {
      compactionPlan(s, d)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("bytes")).as("total_bytes"),
          min(col("bytes")).as("min_file_bytes"),
          max(col("bytes")).as("max_file_bytes"),
          sum(col("n_rows")).as("n_rows"))
        .withColumn("within_bound",
          col("total_bytes") < lit(CompactionTarget) + col("max_file_bytes"))
        .orderBy(col("bin"))
    },
    Some(s"""WITH files AS (
        SELECT epoch_us(ts) // 600000000 AS file_id,
               CAST(count(*) * 40 + sum(length(event_type)) +
                    sum(length(props)) AS BIGINT) AS bytes,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 1),
      packed AS (
        SELECT file_id, bytes, n_rows,
               coalesce(CAST(sum(bytes) OVER (ORDER BY bytes DESC, file_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) // $CompactionTarget AS bin
        FROM files)
      SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(bytes) AS BIGINT) AS total_bytes,
             min(bytes) AS min_file_bytes,
             max(bytes) AS max_file_bytes,
             CAST(sum(n_rows) AS BIGINT) AS n_rows,
             CAST(sum(bytes) AS BIGINT) <
               $CompactionTarget + max(bytes) AS within_bound
      FROM packed GROUP BY bin ORDER BY bin"""),
    note = "bin-packing compaction plan: sorted next-fit over the " +
      "manifest-sized file inventory; packing bound checked in-query; " +
      "ScaleSpec materializes the layout")

  val all: Seq[GraftQuery] = Seq(q135, q152)
}
