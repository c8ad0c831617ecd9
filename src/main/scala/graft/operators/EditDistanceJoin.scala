package graft.operators

import graft.{GraftQuery, Tables}
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PassJoin-style edit-distance self-join (Li, Deng, Feng — "PassJoin: a
  * partition-based method for similarity joins", VLDB 2011; public
  * algorithm): to find all pairs with edit distance <= k, partition each
  * string into k+1 segments — by pigeonhole at least one segment is
  * untouched by the <= k edits, so it appears EXACTLY in the other string
  * at a position shifted by at most k. Candidates therefore come from an
  * equi-join on (segment_index, segment_text) between the k+1 index
  * segments of one side and the (k+1)·(2k+1) shifted probe substrings of
  * the other — O(n·k) candidate keys instead of the O(n²) all-pairs scan,
  * and a plain shuffled hash join at any scale. A thresholded levenshtein
  * then verifies the survivors.
  *
  * This generalizes the reference's ±1-year fuzzy-dedup band (SURVEY J2 /
  * O7) to the string dimension itself: no metadata blocking key needed.
  */
object EditDistanceJoin {

  /** All pairs (a_key < b_key) with levenshtein(a, b) <= k. Strings are
    * assumed near-fixed-length (segment layout uses the probe string's own
    * positions; correct for equal-length corpora like the harness names —
    * general variable-length PassJoin also ranges over length differences). */
  def selfJoin(df: DataFrame, keyCol: String, strCol: String, k: Int,
               segLen: Int): DataFrame = {
    val nSegs = k + 1
    val segs = (0 until nSegs).map { i =>
      struct(lit(i).as("seg_idx"),
        substring(col(strCol), 1 + i * segLen, segLen).as("seg"))
    }
    val probes = (0 until nSegs).flatMap { i =>
      (-k to k).map { d =>
        struct(lit(i).as("seg_idx"),
          substring(col(strCol), 1 + i * segLen + d, segLen).as("seg"))
      }
    }
    val index = df.select(col(keyCol).as("a_key"), col(strCol).as("a_str"),
      explode(array(segs: _*)).as("s"))
      .select(col("a_key"), col("a_str"), col("s.seg_idx"), col("s.seg"))
    val probe = df.select(col(keyCol).as("b_key"), col(strCol).as("b_str"),
      explode(array(probes.distinct: _*)).as("s"))
      .select(col("b_key"), col("b_str"), col("s.seg_idx"), col("s.seg"))
      .distinct()
    index.join(probe, Seq("seg_idx", "seg"))
      .filter(col("a_key") < col("b_key"))
      .select(col("a_key"), col("a_str"), col("b_key"), col("b_str"))
      .distinct()
      .withColumn("lev", levenshtein(col("a_str"), col("b_str"), k).cast("long"))
      .filter(col("lev") >= 0)
  }

  /** PassJoin over customer names, global (no nation blocking — compare
    * q38, which needs a metadata block to avoid O(n²)). Names are fixed
    * length 18 → k=2 gives 3 segments of 6. */
  private val q56 = GraftQuery(
    "q56_passjoin_edit_pairs",
    (s, d) => {
      val c = t(s, d, "customer")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("c_custkey"), col("c_name"))
      selfJoin(c, "c_custkey", "c_name", k = 2, segLen = 6)
        .select(col("a_key"), col("b_key"), col("lev"))
        .orderBy(col("a_key"), col("b_key"))
    },
    Some {
      val nSegs = 3; val k = 2; val segLen = 6
      val segSelects = (0 until nSegs).map { i =>
        s"SELECT c_custkey AS a_key, c_name AS a_str, $i AS seg_idx, substr(c_name, ${1 + i * segLen}, $segLen) AS seg FROM customer"
      }.mkString(" UNION ALL ")
      val probeSelects = (for (i <- 0 until nSegs; dd <- -k to k) yield
        s"SELECT c_custkey AS b_key, c_name AS b_str, $i AS seg_idx, substr(c_name, ${1 + i * segLen + dd}, $segLen) AS seg FROM customer"
        ).mkString(" UNION ALL ")
      s"""WITH idx AS ($segSelects),
      probe AS (SELECT DISTINCT * FROM ($probeSelects)),
      cand AS (SELECT DISTINCT a_key, a_str, b_key, b_str
               FROM idx JOIN probe USING (seg_idx, seg)
               WHERE a_key < b_key)
      SELECT a_key, b_key, CAST(levenshtein(a_str, b_str) AS BIGINT) AS lev
      FROM cand WHERE levenshtein(a_str, b_str) <= $k
      ORDER BY a_key, b_key"""
    })

  val all: Seq[GraftQuery] = Seq(q56)
}
