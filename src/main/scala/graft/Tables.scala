package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the harness tables (TESTDATA.md) plus shared
  * output-determinism helpers used by every query in the registry.
  *
  * Determinism conventions (SURVEY.md §5):
  *  - money/quantity sums go through DECIMAL so Spark and the DuckDB oracle
  *    agree bit-exactly, then cast back to DOUBLE for a stable output type;
  *  - timestamps are emitted as formatted strings (UTC session);
  *  - every query is totally ordered with explicit tiebreak columns.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation cache for the IMMUTABLE harness inputs: every
    * `spark.read.parquet` re-lists the path and re-reads a footer for
    * schema inference — pure fixed overhead when 100+ bench queries each
    * re-open the same static tables (a real deployment reads through a
    * catalog whose file index + schema are cached; this is the local
    * analog). Keyed WEAKLY by the session OBJECT so a cached plan never
    * crosses sessions (identityHashCode can collide across two live
    * sessions) and a stopped session's DataFrames become collectable
    * instead of being retained for the JVM lifetime. Restricted to
    * /root/testdata so anything regenerable (ScaleGen snapshots, test
    * temp dirs, streaming outputs) is always re-listed. */
  private val relCache =
    new java.util.WeakHashMap[
      SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (dir.startsWith("/root/testdata/")) {
      val perSession = relCache.synchronized {
        var m = relCache.get(spark)
        if (m == null) {
          m = scala.collection.concurrent.TrieMap.empty
          relCache.put(spark, m)
        }
        m
      }
      perSession.getOrElseUpdate((dir, name), load(spark, dir, name))
    } else load(spark, dir, name)

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts arrives differently depending on the writer generation —
    * normalize every form to the engine's TIMESTAMP (instant) type so
    * downstream queries (unix_micros, windows, as-of joins) see ONE type:
    *  - parquet TIMESTAMP(NANOS): legacy harness files. Spark's vectorized
    *    reader rejects nanos, so read as LONG (legacy flag) and truncate
    *    to microseconds exactly like DuckDB's nanos→micros read. Integer
    *    `div` — double division would lose precision above 2^53.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): current harness
    *    files (2026-08-13 regeneration); Spark infers TIMESTAMP_NTZ. Cast
    *    to TIMESTAMP re-labels the same micros under the session zone —
    *    the house convention pins every session to UTC (SURVEY §5), so
    *    this is bit-identical to DuckDB's naive read of the same column.
    *  - plain TIMESTAMP: derived snapshots (ScaleGen) — pass through. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Memoized table row count — the catalog statistic a real engine
    * reads for free. Scale-adaptive operators (q38's grid width,
    * GraphOps' conditional broadcasts) need a row count at PLAN time;
    * paying a count job per invocation is wasted work on immutable
    * inputs. Keyed by (session, dir@mtime, table): an in-place
    * regeneration (ScaleGen overwrite) bumps the parquet mtime, so a
    * stale count is never served across a rewrite — and two sessions
    * colliding on the key would read the same files and get the same
    * number, so a collision is harmless. */
  private val countCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), java.lang.Long]()

  def cachedRowCount(spark: SparkSession, dir: String, name: String): Long = {
    val ver = new java.io.File(s"$dir/$name.parquet").lastModified
    countCache.computeIfAbsent(
      (spark.sparkContext.applicationId + "/" + System.identityHashCode(spark),
        s"$dir@$ver", name),
      _ => java.lang.Long.valueOf(t(spark, dir, name).count())).longValue()
  }

  /** Memoized LARGEST-block statistic: max rows per `keyCol` group — the
    * histogram max a catalog would keep per blocking key. r9's q38 used
    * cachedRowCount/|nations| (the MEAN) as its crossover input, which
    * under a skewed block assignment underestimates the largest block
    * and can pick the brute path for a block far above the measured
    * crossover, reinstating the single-partition straggler the selector
    * exists to prevent (ADVICE r9). The real max costs one bounded
    * aggregate (groupBy key → count → max; reduce side = key
    * cardinality), memoized under the same (session, dir@mtime, table,
    * key) immutability contract as cachedRowCount — so steady state
    * (bench timed passes, repeated invocations) pays a map lookup, and a
    * regenerated snapshot can never serve a stale histogram. */
  def cachedMaxBlockRows(spark: SparkSession, dir: String, name: String,
                         keyCol: String): Long =
    cachedMaxBlockRows(spark, dir, name, Seq(keyCol))

  /** Composite-key variant — the histogram max for a multi-column blocking
    * key (q46/q77 block on (p_brand, p_type)). Same memoization contract. */
  def cachedMaxBlockRows(spark: SparkSession, dir: String, name: String,
                         keyCols: Seq[String]): Long = {
    val ver = new java.io.File(s"$dir/$name.parquet").lastModified
    countCache.computeIfAbsent(
      (spark.sparkContext.applicationId + "/" + System.identityHashCode(spark),
        s"$dir@$ver", s"$name#maxblock(${keyCols.mkString(",")})"),
      _ => java.lang.Long.valueOf {
        val r = t(spark, dir, name).groupBy(keyCols.map(col): _*).count()
          .agg(max(col("count"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }).longValue()
  }

  /** Memoized NDV statistic for one column — the catalog distinct-count a
    * real engine keeps per column (here exact, not an HLL estimate: one
    * bounded aggregate on an immutable input, memoized like the others).
    * Drives DistinctPairJoin's crossover: a kernel self-join over a
    * dictionary-shaped column (NDV ≪ rows) is evaluated once per distinct
    * value pair and expanded, instead of once per row pair. */
  def cachedDistinctCount(spark: SparkSession, dir: String, name: String,
                          colName: String): Long = {
    val ver = new java.io.File(s"$dir/$name.parquet").lastModified
    countCache.computeIfAbsent(
      (spark.sparkContext.applicationId + "/" + System.identityHashCode(spark),
        s"$dir@$ver", s"$name#ndv($colName)"),
      _ => java.lang.Long.valueOf(
        t(spark, dir, name).select(col(colName)).distinct().count()
      )).longValue()
  }

  /** Memoized max STRIPPED-suffix length for one string column: max
    * string length minus the corpus-wide common-prefix length (itself
    * derived from the two lexicographic extremes — min/max bound every
    * string's shared prefix). Drives EditDistanceJoin's candidate-scheme
    * crossover (chooseCandidateScheme): short low-alphabet suffixes
    * (zero-padded digit IDs) defeat PassJoin's segment entropy and route
    * to deletion signatures instead. One scalar agg per (dir, mtime,
    * table, column), memoized like every other catalog stat. */
  def cachedStrippedLen(spark: SparkSession, dir: String, name: String,
                        colName: String): Long = {
    val ver = new java.io.File(s"$dir/$name.parquet").lastModified
    countCache.computeIfAbsent(
      (spark.sparkContext.applicationId + "/" + System.identityHashCode(spark),
        s"$dir@$ver", s"$name#strippedlen($colName)"),
      _ => java.lang.Long.valueOf {
        val r = t(spark, dir, name).agg(min(col(colName)).as("mn"),
          max(col(colName)).as("mx"),
          max(length(col(colName))).as("ml")).head()
        if (r.isNullAt(0)) 0L
        else {
          val plen = r.getString(0).zip(r.getString(1))
            .takeWhile { case (a, b) => a == b }.length
          r.getInt(2).toLong - plen
        }
      }).longValue()
  }

  /** Memoized timestamp-domain span (max - min, microseconds) for one
    * column — the value-domain stat a catalog keeps as column min/max.
    * Drives q87's range-join bucket width (r12, VERDICT r11 #5): the
    * right bucket granularity is a function of the domain span and the
    * row count, neither of which a constant can track across sfs. */
  def cachedTsSpanMicros(spark: SparkSession, dir: String, name: String,
                         colName: String): Long = {
    val ver = new java.io.File(s"$dir/$name.parquet").lastModified
    countCache.computeIfAbsent(
      (spark.sparkContext.applicationId + "/" + System.identityHashCode(spark),
        s"$dir@$ver", s"$name#tsspan($colName)"),
      _ => java.lang.Long.valueOf {
        val r = t(spark, dir, name)
          .agg((max(unix_micros(col(colName))) -
            min(unix_micros(col(colName)))).as("span")).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }).longValue()
  }

  /** Cast to DECIMAL(18,s) — exact, associative sums on both engines. */
  def dec(c: Column, s: Int = 2): Column = c.cast(s"decimal(18,$s)")

  /** Scale a born-with-≤s-decimals double to exact integer units
    * (round() recovers the integer the double representation sits ~1e-9
    * off of; rounding mode is irrelevant that far from any .5 boundary). */
  def fixp(c: Column, s: Int = 2): Column =
    round(c * lit(math.pow(10, s))).cast("long")

  /** Exact fixed-point sum emitted as DOUBLE, LONG-accumulated.
    *
    * Replaces sum(DECIMAL(18,s)) with sum over fixp()-scaled integer
    * units: the accumulator is a primitive long inside whole-stage
    * codegen instead of a Decimal (measured: q11's rollup agg 1.41 →
    * 0.66 s, q01 0.92 → 0.47 s at sf0.1 — Decimal aggregation was the
    * dominant per-row cost, not IO). The result is BIT-IDENTICAL to the
    * decimal path — both emit the correctly-rounded double of the exact
    * rational Σ/10^s — so the DuckDB oracle twins keep their
    * sum(DECIMAL) formulation: two different exact-arithmetic routes to
    * the same double are exactly the cross-engine contract the suite
    * hash-checks.
    *
    * Emission goes through one exact DECIMAL division (per OUTPUT group,
    * never in the per-row hot path): r10's `cast(double)/10^s` emission
    * was only single-rounded while |Σ·10^s| < 2^53, and the s=4 revenue
    * sums CROSSED that at the sf100 suite — the guard fired exactly as
    * its scaladoc predicted ("growing past ~sf8 would cross it"). The
    * decimal quotient is exact (≤ s fractional digits at scale ≥ 6) and
    * its double cast is the same correctly-rounded value the old path
    * produced below 2^53 — graded hashes unchanged, envelope now the
    * long accumulator's own 2^63 (ANSI mode throws loudly on true
    * accumulator overflow; the assert keeps a margin below it). Past
    * THAT the remedy remains decimal partial sums. */
  def dsum(c: Column, s: Int = 2): Column = {
    val raw = sum(fixp(c, s))
    val guarded = when(
      assert_true(
        abs(raw) < lit(9000000000000000000L),
        lit(s"dsum overflow: |sum*10^$s| within 2% of 2^63 — switch to decimal partial sums")
      ).isNull,
      raw)
    (guarded.cast("decimal(38,0)") / lit(math.pow(10, s).toLong))
      .cast("double")
  }

  /** Timestamp → canonical string, second precision. */
  def fts(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Timestamp → canonical string, microsecond precision (events.ts). */
  def ftsu(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Date-only canonical string. */
  def fdate(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
