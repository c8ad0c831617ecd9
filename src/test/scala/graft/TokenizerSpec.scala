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

  test("candidate-scheme selection: symdelete for short stripped suffixes, passjoin beyond") {
    import EditDistanceJoin.{chooseCandidateScheme, SymDeleteMaxStrippedLen}
    assert(chooseCandidateScheme(0, 2) == "symdelete")
    assert(chooseCandidateScheme(SymDeleteMaxStrippedLen, 2) == "symdelete")
    assert(chooseCandidateScheme(SymDeleteMaxStrippedLen + 1, 2) == "passjoin")
    assert(chooseCandidateScheme(8, 1) == "symdelete")
    assert(chooseCandidateScheme(30, 1) == "passjoin")
    // symdelete's signature count is O(n^k) — never selected past k=2
    assert(chooseCandidateScheme(5, 3) == "passjoin")
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

  test("blocked k=2: all three auto rungs agree on customers (sf0.001)") {
    // The r12 stripped-length rung (q38's sf100 fix): past the brute
    // crossover, a SHORT stripped suffix routes to per-block deletion
    // signatures, a long one to PassJoin segments. All three rungs must be
    // value-identical — the hints force each path on the same corpus.
    val c = Tables.t(spark, sf, "customer")
      .select(col("c_nationkey").as("nk"), col("c_custkey"), col("c_name"))
    def run(blockHint: Long, slenHint: Long) = EditDistanceJoin.selfJoinAuto(
      c, "c_custkey", "c_name", k = 2, blockCols = Seq("nk"),
      maxBlockRowsHint = Some(blockHint), strippedLenHint = Some(slenHint))
      .orderBy(col("nk"), col("a_key"), col("b_key")).collect().toSeq
    val brute = run(1L, 0L)
    val sym = run(EditDistanceJoin.BruteForceMaxBlock + 1, 1L)   // symdelete
    val pass = run(EditDistanceJoin.BruteForceMaxBlock + 1,      // passjoin
      EditDistanceJoin.SymDeleteMaxStrippedLen + 1)
    assert(brute.nonEmpty)
    assert(brute == sym, "symdelete rung disagrees with brute")
    assert(brute == pass, "passjoin rung disagrees with brute")
  }

  test("global k=1: symdelete and PassJoin K1 rungs agree on customers (sf0.001)") {
    // q56's shape: global equal-length ed<=1 self-join. The depth-1
    // deletion-signature rung must find exactly PassJoin K1's pairs.
    val c = Tables.t(spark, sf, "customer").select(col("c_custkey"), col("c_name"))
    def run(slenHint: Long) = EditDistanceJoin.selfJoinAuto(
      c, "c_custkey", "c_name", k = 1,
      maxBlockRowsHint = Some(EditDistanceJoin.BruteForceMaxBlock + 1),
      strippedLenHint = Some(slenHint))
      .orderBy(col("a_key"), col("b_key")).collect().toSeq
    val sym = run(1L)
    val pass = run(EditDistanceJoin.SymDeleteMaxStrippedLen + 1)
    val brute = EditDistanceJoin.bruteForceSelfJoin(c, "c_custkey", "c_name", 1)
      .orderBy(col("a_key"), col("b_key")).collect().toSeq
    assert(brute.nonEmpty)
    assert(sym == brute)
    assert(pass == brute)
  }

  test("withLens emits exact full-string lengths on every rung, incl. the short-suffix channel") {
    import spark.implicits._
    // Shared "DOC:" prefix + variable suffixes down to EMPTY: K2's
    // short-suffix channel re-strips its sub-corpus's own (longer) common
    // prefix, and withLens must still report ORIGINAL full-string lengths
    // (the r12 subtlety: the channel is fed original strings, not the
    // K2-stripped ones). Reference = brute crossJoin with real lengths.
    val rnd = new scala.util.Random(47)
    val strs = (0L until 220L).map { i =>
      (i, "DOC:" + (0 until rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    }
    val df = strs.toDF("k", "s")
    val a = df.select(col("k").as("ak"), col("s").as("an"))
    val b = df.select(col("k").as("bk"), col("s").as("bn"))
    val brute = a.crossJoin(b).filter(col("ak") < col("bk"))
      .filter(levenshtein(col("an"), col("bn")) <= 2)
      .select(col("ak"), col("bk"), length(col("an")), length(col("bn")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getInt(3))).toMap
    for ((name, got) <- Seq(
      "selfJoinK2" -> EditDistanceJoin.selfJoinK2(df, "k", "s", withLens = true),
      "symdelete" -> EditDistanceJoin.selfJoinSymDelete(df, "k", "s", 2, withLens = true),
      "brute" -> EditDistanceJoin.bruteForceSelfJoin(df, "k", "s", 2, withLens = true))) {
      val m = got.select(col("a_key"), col("b_key"), col("a_len"), col("b_len"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getInt(3))).toMap
      assert(m == brute, s"$name lens mismatch: " +
        s"diff=${(m.toSet diff brute.toSet).take(5)} missing=${(brute.keySet -- m.keySet).take(5)}")
    }
    assert(brute.nonEmpty)
  }

  test("exactly-once PassJoin k=2 emits each pair once with values identical to the groupBy path") {
    import spark.implicits._
    // Three corpora: (a) the short-suffix channel-overlap shape (shared
    // prefix, suffixes 0..6 incl. empty/dups — pairs split across the
    // segment and symdelete channels, which must stay DISJOINT under
    // exactly-once emission); (b) a dense low-alphabet corpus where pairs
    // match at MANY (seg_idx, shift) windows (the multiplicity stress);
    // (c) real part names (q79's shape).
    val rnd = new scala.util.Random(53)
    val corpusA = (0L until 220L).map { i =>
      (i, "DOC:" + (0 until rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    }
    val corpusB = (0L until 300L).map { i =>
      (i, (0 until 6 + rnd.nextInt(3)).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    }
    // (d) non-ASCII: multi-byte code points force the witness kernel's
    // generic (code-point-indexed) path — byte offsets would mis-slice
    // segments here (r13, PassJoinWitness).
    val corpusD = (0L until 200L).map { i =>
      (i, (0 until 4 + rnd.nextInt(5)).map(_ => "éüßж".charAt(rnd.nextInt(4))).mkString)
    }
    val corpora: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "short-suffix" -> corpusA.toDF("k", "s"),
      "low-alphabet" -> corpusB.toDF("k", "s"),
      "non-ascii" -> corpusD.toDF("k", "s"),
      "part-names" -> Tables.t(spark, sf, "part")
        .select(col("p_partkey").as("k"), col("p_name").as("s")))
    for ((name, df) <- corpora) {
      val ref = EditDistanceJoin.selfJoinK2(df, "k", "s", withLens = true)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getInt(3), r.getInt(4))).toMap
      val onceRows = EditDistanceJoin
        .selfJoinK2(df, "k", "s", withLens = true, exactlyOnce = true)
        .collect()
      val once = onceRows.map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getInt(4))).toMap
      assert(onceRows.length == once.size,
        s"$name: duplicate emissions — ${onceRows.length} rows for ${once.size} pairs")
      assert(once == ref, s"$name: value mismatch — " +
        s"missing=${(ref.keySet -- once.keySet).take(5)} " +
        s"extra=${(once.keySet -- ref.keySet).take(5)} " +
        s"diff=${once.collect { case (k, v) if ref.get(k).exists(_ != v) => k }.take(5)}")
      assert(ref.nonEmpty, s"$name: corpus produced no pairs")
    }
  }

  test("symdelete k=1 is lossless on a random variable-length corpus") {
    import spark.implicits._
    // ed<=1 includes insert/delete pairs (|Δlen| = 1), not just the
    // equal-length substitutions selfJoinK1 is contracted to — symdelete
    // must find those too. Corpus: shared prefix + suffixes of length
    // 0..5 over a 3-letter alphabet (dense enough for many true pairs).
    val rnd = new scala.util.Random(43)
    val strs = (0L until 250L).map { i =>
      (i, "ID#" + (0 until rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val df = strs.toDF("k", "s")
    val a = df.select(col("k").as("ak"), col("s").as("an"))
    val b = df.select(col("k").as("bk"), col("s").as("bn"))
    val brute = a.crossJoin(b).filter(col("ak") < col("bk"))
      .filter(levenshtein(col("an"), col("bn")) <= 1)
      .select(col("ak"), col("bk"), levenshtein(col("an"), col("bn")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sym = EditDistanceJoin.selfJoinSymDelete(df, "k", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sym == brute,
      s"missing=${brute.keySet -- sym.keySet} extra=${sym.keySet -- brute.keySet}")
    assert(brute.nonEmpty)
    assert(brute.values.exists(_ == 1L), "no ed=1 pairs — corpus too sparse")
  }
}
