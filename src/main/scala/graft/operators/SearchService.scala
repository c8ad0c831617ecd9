package graft.operators

import graft.{GraftQuery, Tables}
import graft.Tables._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship API, as one library call: POST /api/search
  * end to end (/root/reference/backend/search.py:15-44 + routes.py:13-31).
  *
  * Semantics preserved step by step:
  *  - limit clamp to [1, 100] (search.py:16, config.py:25-26 — SURVEY P7)
  *  - metadata pre-filter BEFORE scoring (search.py:18-20 → pushed into
  *    the scan, SURVEY P1/O1)
  *  - query embedding: here a corpus vector stands in for the embedded
  *    query text (ai_service.py:23-42 is a network call — out of scope)
  *  - overscan 3× then exact re-rank (search.py:38-40 — SURVEY T3/O4)
  *  - result projection with defaults (search.py:46-62 — SURVEY P2)
  */
object SearchService {

  /** The reference's SEARCH_CONFIG (backend/config.py:24-28). */
  object Config {
    val DefaultLimit = 20
    val MaxLimit = 100
    val OverscanFactor = 3                      // search.py:38
    def numCandidates(limit: Int): Int =        // ai_service.py:68
      math.min(50 * limit, 1000)
  }

  /** Strategy-with-degrade (SURVEY O12, search.py:27-38): try the
    * approximate path (LSH buckets — the $vectorSearch analog), fall back
    * to the exact scan on failure, exactly the reference's silent
    * ANN→exact degrade. Both paths serve the same logical query and emit
    * the SAME (vec_id, label) schema, so callers cannot observe which
    * strategy ran; only NonFatal failures degrade (an OOM or interrupt
    * must propagate, not silently switch plans).
    *
    * The metadata pre-filter runs BEFORE/INSIDE the ANN probe, like the
    * filter pushed inside $vectorSearch (ai_service.py:70): the LSH model
    * is fit on the full corpus (bucket geometry is filter-independent),
    * but `approxNearestNeighbors` probes only the FILTERED frame, so a
    * filtered search still returns k rows — post-filtering the ANN output
    * would return fewer than k at scale. */
  def searchWithFallback(spark: SparkSession, dir: String, queryVecId: Long,
                         limit: Int = Config.DefaultLimit,
                         langs: Seq[String] = Seq("en", "fr")): DataFrame = {
    val k = math.max(1, math.min(limit, Config.MaxLimit))
    try {
      import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
      import org.apache.spark.ml.functions.array_to_vector
      val emb = t(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          array_to_vector(col("embedding")).as("features"))
      // P1 pre-filter: docs metadata gate lands in the parquet scan and
      // restricts the candidate frame BEFORE the bucket probe
      val filtered = emb.join(
        t(spark, dir, "documents")
          .filter(col("lang").isin(langs: _*)).select(col("doc_id")),
        col("vec_id") === col("doc_id")).drop("doc_id")
      val lsh = new BucketedRandomProjectionLSH()
        .setBucketLength(0.5).setNumHashTables(2).setSeed(42)
        .setInputCol("features").setOutputCol("hashes")
      val model = lsh.fit(emb)
      val key = emb.filter(col("vec_id") === queryVecId)
        .head().getAs[org.apache.spark.ml.linalg.Vector]("features")
      // numCandidates cap, then exact re-rank of the candidate pool
      model.approxNearestNeighbors(filtered, key, Config.numCandidates(k))
        .orderBy(col("distCol"), col("vec_id"))
        .limit(k)
        .select(col("vec_id"), col("label"))
    } catch {
      case scala.util.control.NonFatal(_) =>
        // degrade to the exact path (search.py:27-38), same output schema
        search(spark, dir, queryVecId, k, langs)
          .join(t(spark, dir, "embeddings").select(col("vec_id"), col("label")),
            col("doc_id") === col("vec_id"))
          .select(col("vec_id"), col("label"))
    }
  }

  def search(spark: SparkSession, dir: String, queryVecId: Long,
             limit: Int = Config.DefaultLimit,
             langs: Seq[String] = Seq("en", "fr")): DataFrame = {
    val k = math.max(1, math.min(limit, Config.MaxLimit)) // P7 clamp
    val qv = t(spark, dir, "embeddings")
      .filter(col("vec_id") === queryVecId).select(col("embedding").as("qvec"))
    val filtered = t(spark, dir, "documents")
      .filter(col("lang").isin(langs: _*)) // P1 — lands in the parquet scan
      .join(t(spark, dir, "embeddings"), col("doc_id") === col("vec_id"))
    val overscan = filtered
      .crossJoin(broadcast(qv))
      .withColumn("coarse", dotProduct(col("embedding"), col("qvec")))
      .orderBy(col("coarse").desc, col("doc_id"))
      .limit(Config.OverscanFactor * k) // T3 overscan
    val reranked = overscan
      .withColumn("score", cosine(col("embedding"), col("qvec")))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    reranked
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select( // P2 projection with defaults
        col("rank"), col("doc_id"),
        coalesce(col("lang"), lit("unknown")).as("lang"),
        coalesce(col("source"), lit("unknown")).as("source"),
        substring(col("text"), 1, 50).as("snippet"))
  }

  /** The profile JSON the reference loads from its working directory
    * (search.py:64-74 load_local_profile; field names from routes.py:65-77:
    * favorite_genres / watched_movies / liked_movies / reviews). A small
    * side-input config file, not scale data — absolute path so the Spark
    * read and the DuckDB oracle (read_json_auto) see the same bytes. */
  val ProfilePath: String =
    sys.props.getOrElse("graft.profile.path", "/root/repo/data/profile.json")

  /** Profile-personalized search (routes.py:65-77 builds user_context from
    * the JSON profile and feeds it to the personalized analysis): the
    * profile is a 1-row broadcast side — `watched_movies` anti-joins the
    * candidates out (never re-recommend), `favorite_genres` boosts via a
    * two-tier ordering (favorite-label matches first, then cosine rank).
    * At scale the profile side stays O(1); both the anti-join and the
    * boost join broadcast, so the only distributed pass is the scored
    * scan — same shape as q20. */
  private val q76 = GraftQuery(
    "q76_profile_personalized",
    (s, d) => {
      val profile = s.read.option("multiLine", "true").json(ProfilePath)
      val watched = profile.select(explode(col("watched_movies")).as("w_id"))
      val favs = profile.select(explode(col("favorite_genres")).as("fav_label"))
      val qv = t(s, d, "embeddings")
        .filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      val scored = t(s, d, "embeddings")
        .join(broadcast(watched), col("vec_id") === col("w_id"), "left_anti")
        .crossJoin(broadcast(qv))
        .withColumn("score", cosine(col("embedding"), col("qvec")))
        .join(broadcast(favs), col("label") === col("fav_label"), "left")
        .withColumn("is_fav", col("fav_label").isNotNull)
      val top = scored
        .orderBy(col("is_fav").desc, col("score").desc, col("vec_id"))
        .limit(20)
      top.withColumn("rank", row_number().over(
          Window.orderBy(col("is_fav").desc, col("score").desc, col("vec_id"))).cast("long"))
        .select(col("rank"), col("vec_id"), col("label"), col("is_fav"))
    },
    Some(s"""WITH p AS (SELECT * FROM read_json_auto('$ProfilePath')),
      watched AS (SELECT unnest(watched_movies) AS w_id FROM p),
      favs AS (SELECT unnest(favorite_genres) AS fav_label FROM p),
      q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
      s AS (SELECT vec_id, label,
              list_cosine_similarity(embedding, qvec) AS score,
              label IN (SELECT fav_label FROM favs) AS is_fav
            FROM embeddings, q
            WHERE vec_id NOT IN (SELECT w_id FROM watched))
      SELECT row_number() OVER (ORDER BY is_fav DESC, score DESC, vec_id) AS rank,
             vec_id, label, is_fav
      FROM s ORDER BY is_fav DESC, score DESC, vec_id LIMIT 20"""))

  /** The API surface as a registry query: requested limit 500 → clamped
    * to 100 (the FIXTURES §2.3 clamp fixture, at query level). */
  private val q29 = GraftQuery(
    "q29_search_api_clamped",
    (s, d) => search(s, d, queryVecId = 0, limit = 500),
    Some("""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
      f AS (SELECT doc_id, lang, source, text, embedding
            FROM documents JOIN embeddings ON doc_id = vec_id
            WHERE lang IN ('en', 'fr')),
      o AS (SELECT *, list_dot_product(embedding, qvec) AS coarse FROM f, q
            ORDER BY coarse DESC, doc_id LIMIT 300),
      r AS (SELECT doc_id, lang, source, text,
              list_cosine_similarity(embedding, qvec) AS score FROM o
            ORDER BY score DESC, doc_id LIMIT 100)
      SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank, doc_id,
        coalesce(lang, 'unknown') AS lang, coalesce(source, 'unknown') AS source,
        substr(text, 1, 50) AS snippet
      FROM r ORDER BY score DESC, doc_id"""))

  val all: Seq[GraftQuery] = Seq(q29, q76)
}
