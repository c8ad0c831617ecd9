package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing and sketch primitives for the
  * large-scale dedup operators (MinHash/LSH, SimHash, fingerprinting).
  *
  * The core trick: a 32-bit unsigned hash derived from md5 —
  * `conv(substr(md5(s), 1, 8), 16, 10)` in Spark equals
  * `('0x' || substr(md5(s), 1, 8))::BIGINT` in DuckDB — so the whole
  * MinHash→band→bucket-join pipeline is oracle-checkable end to end.
  * Spark's builtin `hash()` (Murmur3) has no DuckDB twin, hence md5.
  *
  * Both the Spark Column trees and the DuckDB SQL strings are generated
  * from the same constants below to prevent drift.
  */
object HashFunctions {

  /** Number of MinHash signatures and LSH banding shape (bands × rows). */
  val NumHashes = 12
  val BandRows = 3
  val NumBands: Int = NumHashes / BandRows // 4
  /** Word-shingle width for MinHash/SimHash (3-word shingles — the harness
    * documents draw from a tiny vocabulary, so 1-grams would collide). */
  val ShingleN = 3

  /** 32-bit unsigned md5-derived hash of a string column (seeded). */
  def md5Int(c: Column, seed: Int): Column =
    conv(substring(md5(concat(c, lit("#" + seed))), 1, 8), 16, 10).cast("long")

  def md5IntSql(e: String, seed: Int): String =
    s"('0x' || substr(md5($e || '#$seed'), 1, 8))::BIGINT"

  /** Unseeded variant (content fingerprint). */
  def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Distinct 3-word shingles of a single-space-tokenized text.
    * Spark `sequence`/`element_at` are 1-based like DuckDB list indexing. */
  def shingles(toks: Column): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (ShingleN - 1), lit(0))),
        i => concat_ws(" ",
          element_at(toks, i),
          element_at(toks, i + 1),
          element_at(toks, i + 2))))

  /** DuckDB twin: range(1, n) is end-exclusive → 1..n-1. */
  def shinglesSql(toksExpr: String): String =
    s"list_distinct(list_transform(range(1, greatest(len($toksExpr) - ${ShingleN - 1}, 0) + 1), i -> $toksExpr[i] || ' ' || $toksExpr[i+1] || ' ' || $toksExpr[i+2]))"

  /** MinHash signature value k over a shingle array. */
  def minHash(sh: Column, k: Int): Column =
    array_min(transform(sh, s => md5Int(s, k)))

  def minHashSql(shExpr: String, k: Int): String =
    s"list_min(list_transform($shExpr, s -> ${md5IntSql("s", k)}))"

  /** LSH band key b (0-based): md5 of the band's concatenated signature. */
  def bandKey(mh: Seq[Column], b: Int): Column =
    md5(concat_ws(",", mh.slice(b * BandRows, (b + 1) * BandRows): _*))

  def bandKeySql(mhExprs: Seq[String], b: Int): String = {
    val parts = mhExprs.slice(b * BandRows, (b + 1) * BandRows)
      .map(e => s"CAST($e AS VARCHAR)").mkString(" || ',' || ")
    s"md5($parts)"
  }

  /** 32-bit SimHash over a shingle array: bit j of the result is set iff
    * the sum over shingles of ±1 (sign of hash bit j) is positive.
    * Computed per-row with HOFs (no explode/shuffle): for each bit,
    * popcount-style aggregate over the array. */
  def simHash(sh: Column): Column = {
    val bits = (0 until 32).map { j =>
      val votes = aggregate(
        sh,
        lit(0L),
        (acc, s) => acc + when(shiftright(md5Int(s, 999), j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** DuckDB twin of [[simHash]] (generated from the same bit loop). */
  def simHashSql(shExpr: String): String = {
    val h = md5IntSql("s", 999)
    val bits = (0 until 32).map { j =>
      s"(CASE WHEN list_sum(list_transform($shExpr, s -> CASE WHEN (($h) >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END)"
    }
    "(" + bits.mkString(" + ") + ")::BIGINT"
  }
}
