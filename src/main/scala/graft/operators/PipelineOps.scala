package graft.operators

import graft.{GraftQuery, Tables}
import graft.Tables._
import graft.functions.expressions.StringRatio.string_ratio
import graft.pipeline.MoviePipeline
import org.apache.spark.sql.functions._

/** Queries that drive the movie curation pipeline (graft.pipeline) and the
  * custom StringRatio expression through the driver's correctness gate.
  */
object PipelineOps {

  /** End-to-end parse pipeline round-trip: render documents rows into the
    * reference's raw LLM-record format (TITLE:/YEAR:/... lines,
    * movie_generator.py:294-300), run the full parse→validate→enrich
    * pipeline, and emit the parsed fields. The oracle derives the same
    * fields directly from the source columns — an independent equation
    * `parse(render(x)) = x` that hash-checks F1-F7 and the slug/id rules. */
  private val q45 = GraftQuery(
    "q45_parse_pipeline_roundtrip",
    (s, d) => {
      val toks = split(col("text"), " ")
      val rendered = t(s, d, "documents").select(
        col("doc_id"),
        concat(
          lit("TITLE: "), concat_ws(" ",
            element_at(toks, 1), element_at(toks, 2)),
          lit("\nYEAR: "), (lit(1900) + col("doc_id") % 100),
          lit("\nDIRECTOR: "), col("source"),
          lit("\nGENRES: "), col("lang"), lit(", misc"),
          lit("\nPLOT: "), substring(col("text"), 1, 40)).as("raw"))
      val parsed = MoviePipeline.enrich(MoviePipeline.validate(
        MoviePipeline.parseRaw(rendered)))
      parsed.select(col("doc_id"), col("title"), col("year"),
          col("director"), col("id"),
          col("structured_enrichment.themes").getItem(0).as("theme0"),
          col("plot"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2] AS title,
      CASE WHEN 1900 + doc_id % 100 BETWEEN 1900 AND 2030
           THEN CAST(1900 + doc_id % 100 AS INT) ELSE 2000 END AS year,
      source AS director,
      regexp_replace(lower(trim(string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2])), ' ', '_', 'g')
        || '_' || CAST(1900 + doc_id % 100 AS VARCHAR) AS id,
      lang AS theme0,
      trim(regexp_replace(substr(text, 1, 40), '\s+', ' ', 'g')) AS plot
      FROM documents ORDER BY doc_id"""))

  /** Ratcliff/Obershelp fuzzy pairs over part names within a brand block —
    * drives the custom StringRatio codegen expression at query level.
    * difflib semantics have no DuckDB twin (SURVEY F8) → rows-only; the
    * expression itself is pinned to difflib goldens in FunctionsSpec. */
  private val q46 = GraftQuery(
    "q46_ratcliff_fuzzy_pairs",
    (s, d) => {
      // blocking key (brand, type) bounds the quadratic pair count —
      // the same blocked-self-join shape as the reference's year band
      val p = t(s, d, "part")
      // spread the quadratic ratio scan across cores (single-split input)
      val a = p.repartition(s.sparkContext.defaultParallelism)
        .select(col("p_brand"), col("p_type"), col("p_partkey").as("a_key"),
        col("p_name").as("a_name"))
      val b = p.select(col("p_brand"), col("p_type"), col("p_partkey").as("b_key"),
        col("p_name").as("b_name"))
      a.join(b, Seq("p_brand", "p_type"))
        .filter(col("a_key") < col("b_key"))
        .withColumn("ratio",
          round(string_ratio(lower(col("a_name")), lower(col("b_name"))), 6))
        .filter(col("ratio") >= 0.85)
        .select(col("p_brand"), col("a_key"), col("b_key"), col("ratio"))
        .orderBy(col("p_brand"), col("a_key"), col("b_key"))
    },
    None,
    note = "Ratcliff/Obershelp has no SQL twin; pinned to difflib in tests")

  /** Pipeline cost accounting per source (SURVEY A7/F11): exact integer
    * nanodollar arithmetic so the sum is associative and oracle-stable. */
  private val q47 = GraftQuery(
    "q47_cost_model",
    (s, d) => {
      import graft.pipeline.CostModel
      t(s, d, "documents")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(CostModel.estTokens(col("n_chars"))).as("est_tokens"),
          (sum(CostModel.costNanos(col("n_chars"))) / lit(1e9)).as("cost_usd"))
        .orderBy(col("source"))
    },
    Some(s"""SELECT source, count(*) AS n_docs,
      CAST(sum(${graft.pipeline.CostModel.estTokensSql("n_chars")}) AS BIGINT) AS est_tokens,
      CAST(sum(${graft.pipeline.CostModel.costNanosSql("n_chars")}) AS BIGINT) / 1e9 AS cost_usd
      FROM documents GROUP BY source ORDER BY source"""))

  val all: Seq[GraftQuery] = Seq(q45, q46, q47)
}
