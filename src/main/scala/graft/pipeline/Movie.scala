package graft.pipeline

import java.sql.Timestamp

/** The movie record as a typed Dataset row — the explicit schema this
  * engine fixes over the reference's dynamic BSON documents (SURVEY.md
  * §1.2/§1.3; field inventory from /root/reference/movie_generator.py:
  * 340-386 and backend/search.py:46-62). Optional reference fields are
  * Options (absent key ≡ SQL NULL — the documented semantic delta vs
  * Mongo's key-dropping, search.py:62). */
case class StructuredEnrichment(themes: Seq[String], significance: String)

case class Movie(
    title: String,
    year: Int,
    director: Option[String],
    cast: Seq[String],
    genres: Seq[String],
    plot: Option[String],
    description: Option[String],
    structured_enrichment: Option[StructuredEnrichment],
    id: String,
    processing_status: String,
    created_at: Timestamp)

object Movie {
  /** Typed view of the parse pipeline's output — compile-time field checks
    * for downstream stages (SURVEY §1.3: Dataset[Movie] where type safety
    * pays; untyped DataFrame elsewhere). */
  def typed(parsed: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[Movie] = {
    import parsed.sparkSession.implicits._
    parsed.selectExpr(
      "title", "CAST(year AS INT) AS year", "director", "cast", "genres",
      "plot", "description", "structured_enrichment", "id",
      "processing_status", "created_at"
    ).as[Movie]
  }
}
