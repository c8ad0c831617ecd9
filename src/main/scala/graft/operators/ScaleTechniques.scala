package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques that only pay off on a real cluster — expressed as
  * library operators so they are testable locally and lift unchanged to
  * 100 TB (SURVEY.md §4 "what we add via Spark"; brief: bucketing for
  * co-located joins, salting for skew).
  */
object ScaleTechniques {

  /** Salted aggregation for skewed group keys: two-phase — partial
    * aggregate on (key, salt) spreads a hot key over `salts` reducers,
    * then the tiny per-key final combine. Results are identical to the
    * direct groupBy (asserted in ScaleSpec); only the shuffle layout
    * changes. Use when one key owns a disproportionate share of rows.
    *
    * The salt is derived from ROW CONTENT, never from a nondeterministic
    * expression: monotonically_increasing_id()/rand() are re-evaluated on
    * stage retry, so after a fetch failure recomputed rows could land in
    * different (key, salt) buckets and double-count or drop — exactly on
    * the large clusters salting targets. hash(content) is retry-stable. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 16): DataFrame =
    df
      .withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(
        sum(col(valueCol)).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))

  /** Salted broadcast-replicated join for a skewed fact key: the fact side
    * gets a random salt in [0, salts); the (small) dim side is exploded
    * `salts` ways so every (key, salt) bucket finds its match. Equivalent
    * to a plain inner equi-join on `key` (asserted in ScaleSpec), but a
    * hot fact key spreads across `salts` tasks instead of one straggler. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    // content-derived salt (retry-stable — see saltedSumCount)
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(salts)))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Bucketed table writes: pre-shuffling both sides of a recurring join
    * into the same bucket layout makes every future join on the key
    * exchange-free (co-located). ScaleSpec asserts the bucketed join
    * plans without a shuffle on either side. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
}
