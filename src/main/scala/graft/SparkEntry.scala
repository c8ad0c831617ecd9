package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[QueryRegistry]]; this object is the thin adapter.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pre-filtered vector top-k — the reference's POST /api/search path
    * (/root/reference/backend/search.py:15-44) re-expressed Spark-first. */
  def entry(spark: SparkSession): DataFrame =
    QueryRegistry.byName("q21_vector_topk_prefiltered")
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (MLlib hashing / LSH) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    QueryRegistry.queries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
