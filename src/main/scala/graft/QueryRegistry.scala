package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark DataFrame program plus (when expressible)
  * its exact ANSI-SQL twin run by the driver's DuckDB oracle on the same
  * parquet tables. `oracle = None` → driver records a weaker rows-only check
  * (reserved for genuinely non-SQL ops like MLlib LSH).
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    note: String = "")

object QueryRegistry {
  lazy val queries: Seq[GraftQuery] =
    operators.Relational.all ++
      operators.VectorSearch.all ++
      operators.DedupText.all ++
      operators.EventOps.all ++
      operators.MLPipelineOps.all ++
      operators.PipelineOps.all ++
      operators.SqlSurface.all ++
      operators.SearchService.all ++
      operators.EditDistanceJoin.all ++
      operators.CurationOps.all ++
      operators.AssemblyOps.all ++
      operators.CorpusOps.all ++
      operators.TokenizerOps.all ++
      operators.SketchOps.all

  lazy val byName: Map[String, GraftQuery] =
    queries.map(q => q.name -> q).toMap
}
