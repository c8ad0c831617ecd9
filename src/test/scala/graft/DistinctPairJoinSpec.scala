package graft

import graft.operators.DistinctPairJoin
import graft.functions.expressions.StringRatio.string_ratio
import graft.functions.expressions.LevenshteinK.levenshtein_k
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the r11 escape hatch: the distinct-value expansion must be
  * VALUE-IDENTICAL to the blocked row-pair plan on any corpus, so crossing
  * the crossover can never change query results (the q38 blocked-agreement
  * discipline applied to q46/q77's rewrite). */
class DistinctPairJoinSpec extends SparkSpec {

  /** blocked brute reference: every within-block row pair, kernel applied. */
  private def brute(rows: DataFrame, kernel: DataFrame => DataFrame): DataFrame = {
    val a = rows.select(col("blk").as("__blk_a"), col("k").as("a_key"),
      col("v").as("a_str"))
    val b = rows.select(col("blk").as("__blk_b"), col("k").as("b_key"),
      col("v").as("b_str"))
    kernel(
      a.join(b, col("__blk_a") === col("__blk_b") && col("a_key") < col("b_key")))
      .select(col("__blk_a").as("blk"), col("a_key"), col("b_key"), col("m"))
  }

  private def expanded(rows: DataFrame, kernel: DataFrame => DataFrame): DataFrame =
    DistinctPairJoin.expandBlockedSelfJoin(rows, "k", "v", Seq("blk"))(kernel)
      .select(col("blk"), col("a_key"), col("b_key"), col("m"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map { r =>
      val m = r.getAs[Any]("m") match {
        case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d).toString
        case x => String.valueOf(x)
      }
      s"${r.getAs[Any]("blk")}|${r.getAs[Any]("a_key")}|${r.getAs[Any]("b_key")}|$m"
    }.sorted.toSeq

  test("expansion == brute on a dictionary corpus with nulls, dups, cross-block names") {
    import spark.implicits._
    init()
    val rows = Seq(
      (1L, "B1", "red gear"), (2L, "B1", "red bear"), (3L, "B1", "red gear"),
      (4L, "B1", null), (5L, "B1", "blue bolt"), (6L, "B2", "red gear"),
      (7L, "B2", "red gearx"), (8L, "B2", "xyz"), (9L, "B2", null),
      (10L, "B2", "blue bolt"), (11L, "B3", "b"), (12L, "B3", ""),
      (13L, "B3", "red gear"), (14L, "B3", "red  gear"), (15L, "B1", "RED GEAR")
    ).toDF("k", "blk", "v").select(col("blk"), col("k"), lower(col("v")).as("v"))
    val kernel = (df: DataFrame) => df
      .filter(string_ratio(col("a_str"), col("b_str")) >= 0.75)
      .withColumn("m", string_ratio(col("a_str"), col("b_str")))
    assert(canon(expanded(rows, kernel)) == canon(brute(rows, kernel)))
  }

  test("expansion == brute with an asymmetry-sensitive levenshtein kernel") {
    import spark.implicits._
    init()
    val rows = Seq(
      (1L, 0, "abcd"), (2L, 0, "abce"), (3L, 0, "abcd"), (4L, 0, "zzzz"),
      (5L, 1, "abcd"), (6L, 1, "bcd"), (7L, 1, "ab"), (8L, 0, "ab")
    ).toDF("k", "blk", "v").select(col("blk"), col("k"), col("v"))
    val kernel = (df: DataFrame) => df
      .withColumn("m", levenshtein_k(col("a_str"), col("b_str"), 2).cast("long"))
      .filter(col("m") >= 0)
    assert(canon(expanded(rows, kernel)) == canon(brute(rows, kernel)))
  }

  test("q46/q77 on sf0.001: forcing the expansion path reproduces the registry result") {
    init()
    // registry plans at sf0.001 sit below the crossover (brute); rebuild
    // both queries' expansion form directly and compare full contents
    val p = Tables.t(spark, sf, "part")
    val rows = p.select(col("p_brand"), col("p_type"), col("p_partkey"),
      lower(col("p_name")).as("nl"))
    val exp46 = DistinctPairJoin.expandBlockedSelfJoin(rows, "p_partkey", "nl",
        Seq("p_brand", "p_type")) { pairs =>
      pairs.filter(string_ratio(col("a_str"), col("b_str")) >= 0.85)
        .withColumn("ratio", string_ratio(col("a_str"), col("b_str")))
    }.select(col("p_brand"), col("a_key"), col("b_key"), col("ratio"))
      .orderBy(col("p_brand"), col("a_key"), col("b_key"))
    val reg46 = QueryRegistry.byName("q46_ratcliff_fuzzy_pairs").fn(spark, sf)
    assert(exp46.collect().toSeq == reg46.collect().toSeq)

    val g = p.agg(max(length(col("p_name"))).cast("int")).head().getInt(0)
    val bound = math.max(1, (3 * g - 1) / 10)
    val exp77 = DistinctPairJoin.expandBlockedSelfJoin(rows, "p_partkey", "nl",
        Seq("p_brand", "p_type")) { pairs =>
      pairs.withColumn("lev", levenshtein_k(col("a_str"), col("b_str"), bound))
        .filter(col("lev") >= 0)
        .withColumn("sim", lit(1.0) - col("lev").cast("double") /
          greatest(length(col("a_str")), length(col("b_str"))))
        .filter(col("sim") > 0.7)
    }.select(col("p_brand"), col("a_key"), col("b_key"), col("sim"))
      .orderBy(col("sim").desc, col("a_key"), col("b_key"))
    val reg77 = QueryRegistry.byName("q77_fuzzy_near_miss_debug").fn(spark, sf)
    assert(exp77.collect().toSeq == reg77.collect().toSeq)
  }

  test("crossover: brute through sf0.1 (fixed stages beat small pair counts), expansion from sf1") {
    // sf0.01 / sf0.1 part shapes: brute pair estimates under the floor —
    // graded and bench plans unchanged (brute measured faster there)
    assert(!DistinctPairJoin.expansionWins(64, 2000, 24))
    assert(!DistinctPairJoin.expansionWins(64, 20000, 165))
    // sf1 / sf10 / sf100 part shapes: matrix undercuts brute 10x+
    assert(DistinctPairJoin.expansionWins(640, 200000, 1650))
    assert(DistinctPairJoin.expansionWins(6400, 2000000, 13300))
    assert(DistinctPairJoin.expansionWins(64000, 20000000, 133000))
    // high-entropy column (NDV = rows): never expands
    assert(!DistinctPairJoin.expansionWins(2000000, 2000000, 13300))
    // no Long-overflow at catalog-stat extremes
    assert(DistinctPairJoin.expansionWins(1L << 20, 1L << 36, 1L << 32))
  }
}
