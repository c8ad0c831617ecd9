package graft

import graft.operators.{EditDistanceJoin, TokenizerOps}
import org.apache.spark.sql.functions._

/** BPE merge-trainer golden test (classic Sennrich arXiv:1508.07909
  * fixture, expected merges computed by an independent reference Python
  * BPE) + edit-distance join strategy auto-selection. */
class TokenizerSpec extends SparkSpec {
  init()

  test("BPE trainer matches reference Python BPE on the Sennrich fixture") {
    import spark.implicits._
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "freq")
    val got = TokenizerOps.train(dict, 8)
      .select("round", "a", "b", "merged", "cnt")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    // reference python BPE (left-to-right non-overlapping merge, max-count
    // pair with lexicographic (a, b) tie-break) on the same dict
    val expected = Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L),
      (4L, "lo", "w", "low", 7L),
      (5L, "e", "w", "ew", 6L),
      (6L, "ew", "est", "ewest", 6L),
      (7L, "n", "ewest", "newest", 6L),
      (8L, "d", "est", "dest", 3L))
    assert(got == expected)
  }

  test("BPE merge application is left-to-right non-overlapping (a a a case)") {
    import spark.implicits._
    // "aaa" with pair (a,a) must become [aa, a], not [aa, aa] or [a, aa]
    val dict = Seq(("aaa", 10L), ("ab", 1L)).toDF("w", "freq")
    val merges = TokenizerOps.train(dict, 1).collect()
    assert(merges.length == 1)
    val m = merges.head
    assert((m.getString(1), m.getString(2)) == ("a", "a"))
    // count: "aaa" has 2 adjacent (a,a) pairs * freq 10 = 20
    assert(m.getLong(4) == 20L)
  }

  test("edit-distance join strategy selection: brute under threshold, passjoin above") {
    assert(EditDistanceJoin.chooseStrategy(100) == "brute")
    assert(EditDistanceJoin.chooseStrategy(EditDistanceJoin.BruteForceMaxBlock) == "brute")
    assert(EditDistanceJoin.chooseStrategy(EditDistanceJoin.BruteForceMaxBlock + 1) == "passjoin")
    assert(EditDistanceJoin.chooseStrategy(10, threshold = 5) == "passjoin")
  }

  test("brute-force and PassJoin k=1 paths agree on customers (sf0.001)") {
    val c = Tables.t(spark, sf, "customer").select(col("c_custkey"), col("c_name"))
    val brute = EditDistanceJoin.bruteForceSelfJoin(c, "c_custkey", "c_name", 1)
      .orderBy(col("a_key"), col("b_key")).collect().toSeq
    val pass = EditDistanceJoin.selfJoinK1(c, "c_custkey", "c_name")
      .orderBy(col("a_key"), col("b_key")).collect().toSeq
    assert(brute.nonEmpty)
    assert(brute == pass)
  }

  test("blocked k=2: brute and PassJoin auto paths agree on customers (sf0.001)") {
    // q38's shape: nation-blocked ed<=2 self-join. The auto-selector's two
    // paths must be value-identical, because the crossover is driven by a
    // row-count HINT (cached catalog stat) that only moves time — the hash
    // gate at sf0.01 only ever exercises the brute side, so the PassJoin
    // side is pinned here.
    val c = Tables.t(spark, sf, "customer")
      .select(col("c_nationkey").as("nk"), col("c_custkey"), col("c_name"))
    def run(hint: Long) = EditDistanceJoin.selfJoinAuto(
      c, "c_custkey", "c_name", k = 2, blockCols = Seq("nk"),
      maxBlockRowsHint = Some(hint))
      .orderBy(col("nk"), col("a_key"), col("b_key")).collect().toSeq
    val brute = run(1L)                                         // forces brute
    val pass = run(EditDistanceJoin.BruteForceMaxBlock + 1)     // forces PassJoin
    assert(brute.nonEmpty)
    assert(brute == pass)
  }
}
