package graft.operators

import graft.GraftQuery
import graft.Tables._
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

  val all: Seq[GraftQuery] = Seq(q135)
}
