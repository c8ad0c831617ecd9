package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinct-value expansion for blocked similarity self-joins — the escape
  * hatch for block keys that do NOT scale with data (VERDICT r10 #1).
  *
  * The reference's fuzzy debug scans (movie_generator.py:613-648) pair every
  * row against every other row in a metadata block and score an expensive
  * string kernel per pair. When the blocking key has FIXED cardinality
  * (brand/type enums — 150 blocks at every scale factor), block size grows
  * linearly with the corpus and the pair count quadratically: at 1000× the
  * graded scale that is ~1.3T kernel evaluations, 4-14 h on this box
  * (ROUND10.md §6b). But the kernel's VALUE depends only on the string
  * pair, and the string column is drawn from a bounded vocabulary (64
  * distinct part names per shard — a classic warehouse dictionary-column
  * shape). So past the crossover the right plan evaluates the kernel once
  * per distinct ORIENTED value pair (d² evals, d = NDV, independent of row
  * count within a decade) and expands the surviving value pairs back to row
  * pairs with two hash joins — the same rewrite a columnar engine gets from
  * dictionary encoding.
  *
  * Exactness: every oriented (a_str, b_str) combination — including the
  * diagonal — is evaluated with the SAME kernel expression the row-pair
  * plan used, so each row pair (a_key < b_key) receives the identical
  * measure value it would have received in the blocked-brute plan; no
  * symmetry assumption about the kernel is needed. Rows with a NULL value
  * never pair in either plan (the kernel's null propagates into the
  * row-plan's filter; the equi-join drops them here).
  */
object DistinctPairJoin {

  /** Crossover. Brute pair probes are bounded by rows·maxBlock/2
    * (Σ n_b²/2 ≤ maxBlock·Σn_b/2; exact when blocks are uniform); the
    * expansion pays 2·d² kernel evals (both orientations of the distinct
    * matrix) PLUS a fixed pipeline (distinct agg + checkpoint + two hash
    * joins — measured ~0.4-0.7 s of stage latency at sf0.1, where brute
    * finishes in 0.44 s). So expansion must clear TWO bars: the brute
    * estimate exceeds an absolute floor that amortizes the fixed stages
    * (8M pairs ≈ 2-3 s at the measured ~300 ns/pair), and the matrix
    * undercuts brute by 10× so the win is structural, not marginal. On
    * high-entropy columns (d ≈ n) the second bar never clears and
    * callers keep their existing brute/banded plans. Inputs come from
    * the memoized catalog stats (Tables.cachedDistinctCount /
    * cachedMaxBlockRows / cachedRowCount), so steady state pays map
    * lookups and no jobs. */
  val BrutePairsFloor = 8000000.0
  def expansionWins(distinctVals: Long, totalRows: Long,
                    maxBlockRows: Long): Boolean = {
    val brutePairs = totalRows.toDouble * maxBlockRows / 2.0
    brutePairs > BrutePairsFloor &&
      2.0 * distinctVals * distinctVals < brutePairs / 10.0
  }

  /** Rewrite a blocked kernel self-join over a low-cardinality column.
    *
    * `rows` must carry blockCols ++ (keyCol, valCol). `survivors` receives
    * the oriented distinct-value pair frame (a_str, b_str) — every ordered
    * combination including the diagonal — and must apply the kernel and
    * its threshold filter, returning (a_str, b_str, measure...). The
    * result is one row per qualifying row pair (a_key < b_key, same
    * block), carrying blockCols ++ (a_key, b_key) ++ the survivor measure
    * columns.
    *
    * Plan shape at scale: the distinct set is collected once
    * (localCheckpoint — d rows, kilobytes to low megabytes), the value
    * matrix is a broadcast nested-loop over that bounded set (d² stays
    * ~constant per decade because vocabulary grows with SHARDS, not rows),
    * and the expansion is a pair of hash joins whose shuffle volume is
    * input + output sized. AQE (kept for these queries) broadcasts the
    * survivor frame at runtime when it is small. */
  def expandBlockedSelfJoin(
      rows: DataFrame, keyCol: String, valCol: String,
      blockCols: Seq[String])(
      survivors: DataFrame => DataFrame): DataFrame = {
    val spark = rows.sparkSession
    val bc = blockCols.map(col)
    // distinct values, spread across the cluster so the d² kernel matrix
    // below parallelizes; checkpointed so the two cross sides and the
    // expansion join don't re-run the distinct aggregation
    val vals = rows.select(col(valCol).as("a_str"))
      .filter(col("a_str").isNotNull).distinct()
      .repartition(spark.sparkContext.defaultParallelism)
      // serialized blocks: local-checkpoint evictions are unrecoverable,
      // and compact bytes survive allocation pressure (GraphOps' sf100
      // lesson); the set is small so the level costs nothing
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // oriented value matrix: broadcast one side (d strings — bounded
    // vocabulary by the crossover's own premise), stream the other
    val pairs = vals.crossJoin(broadcast(vals.select(col("a_str").as("b_str"))))
    val surv = survivors(pairs)
    val rowsA = rows.select(
      (bc :+ col(keyCol).as("a_key") :+ col(valCol).as("a_str")): _*)
    val rowsB = rows.select(
      (bc :+ col(keyCol).as("b_key") :+ col(valCol).as("b_str")): _*)
    rowsA.join(surv, "a_str")
      .join(rowsB, blockCols :+ "b_str")
      .filter(col("a_key") < col("b_key"))
  }
}
