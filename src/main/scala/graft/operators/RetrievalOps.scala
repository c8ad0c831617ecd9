package graft.operators

import graft.GraftQuery
import graft.Tables._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the reference exposes BOTH a lexical search path
  * (/root/reference/backend/search.py:15-44, Mongo text/regex match) and a
  * semantic vector path (/root/reference/backend/ai_service.py:59-119);
  * production retrieval fuses the two. q130 is that composed surface:
  * BM25 top-k (q90's scorer) and cosine top-k (q20's shape) merged by
  * Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009:
  * score(d) = Σ_lists 1/(C + rank_list(d)), C = 60).
  *
  * Engine portability: each list contributes floor(1e6/(60+rank)) — an
  * integer division of exact integers — so the fused score is an
  * order-independent integer sum and the whole query hash-checks.
  *
  * Scale shape: each branch is TakeOrderedAndProject (per-partition heaps,
  * k rows to the driver — no corpus sort); the fusion join touches 2k rows
  * regardless of corpus size. At 100 TB nothing but the two scans and the
  * BM25 token-count shuffle grows with the data.
  */
object RetrievalOps {

  private val C = 60 // RRF damping constant (the SIGIR 2009 default)
  private val K = 20 // per-list depth
  private val TopN = 10

  private val q130 = GraftQuery(
    "q130_hybrid_rrf_fusion",
    (s, d) => {
      val lex = DedupText.bm25Scored(s, d, Seq("dup", "merge", "vector"))
        .orderBy(col("score_micro").desc, col("doc_id")).limit(K)
        .withColumn("lex_rank", row_number().over(
          Window.orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("lex_rank"))
      val sem = t(s, d, "embeddings")
        .crossJoin(broadcast(VectorSearch.queryVec(s, d, 0)))
        .withColumn("score", cosine(col("embedding"), col("qvec")))
        .orderBy(col("score").desc, col("vec_id")).limit(K)
        .withColumn("vec_rank", row_number().over(
          Window.orderBy(col("score").desc, col("vec_id"))).cast("long"))
        .select(col("vec_id").as("doc_id"), col("vec_rank"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .withColumn("rrf_micro",
          coalesce(expr(s"${1e6.toLong} div ($C + lex_rank)"), lit(0L)) +
            coalesce(expr(s"${1e6.toLong} div ($C + vec_rank)"), lit(0L)))
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(TopN)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rrf_micro").desc, col("doc_id"))).cast("long"))
        // rank 0 = "not in that list" (keeps the output null-free; the
        // correctness gate hash-compares cells and a NULL has no stable
        // cross-engine representation)
        .select(col("rank"), col("doc_id"), col("rrf_micro"),
          coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
          coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
      tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
      dl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS dl FROM tc GROUP BY doc_id),
      stats AS (SELECT count(*) AS n,
                       CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      terms(tok) AS (VALUES ('dup'), ('merge'), ('vector')),
      tf AS (SELECT doc_id, tok, c AS tf FROM tc JOIN terms USING (tok)),
      dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      scored AS (
        SELECT doc_id,
          CAST(round((CAST(length(bin((n + 1) // (df + 1))) AS BIGINT) *
            ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))) * 1000000.0)
            AS BIGINT) AS contrib_micro
        FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id), stats),
      lexs AS (SELECT doc_id, sum(contrib_micro) AS score_micro
               FROM scored GROUP BY doc_id),
      lex AS (SELECT doc_id, row_number() OVER
                (ORDER BY score_micro DESC, doc_id) AS lex_rank
              FROM (SELECT * FROM lexs
                    ORDER BY score_micro DESC, doc_id LIMIT 20)),
      q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
      semsc AS (SELECT vec_id, list_cosine_similarity(embedding, qvec) AS score
                FROM embeddings, q),
      sem AS (SELECT vec_id AS doc_id, row_number() OVER
                (ORDER BY score DESC, vec_id) AS vec_rank
              FROM (SELECT * FROM semsc ORDER BY score DESC, vec_id LIMIT 20)),
      fused AS (
        SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
               lex_rank, vec_rank,
               coalesce(1000000 // (60 + lex_rank), 0) +
                 coalesce(1000000 // (60 + vec_rank), 0) AS rrf_micro
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
      SELECT row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS rank,
             doc_id, rrf_micro,
             coalesce(lex_rank, 0) AS lex_rank,
             coalesce(vec_rank, 0) AS vec_rank
      FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 10"""))

  /** q142 — positional-postings phrase search: the inverted-index
    * operation BM25 (q90) cannot answer — "these words ADJACENT, in this
    * order". Build positional postings (term, doc, position) by explode,
    * then resolve the phrase "fast spark" as an equi-join of the two
    * terms' postings on (doc_id, adjacent positions) — exactly how a
    * search engine intersects postings lists, expressed as dataflow.
    *
    * Scale shape: the postings build is a narrow explode (and at 100 TB
    * would be written ONCE, term-bucketed, as the persistent index — the
    * BandIndexStore pattern); the phrase probe filters to the two query
    * terms BEFORE the join, so join input is bounded by term frequency,
    * not corpus size, and the adjacency match is an equi-join on
    * (doc_id, pos) — no inequality blowup. */
  val q142 = GraftQuery(
    "q142_phrase_search_postings",
    (s, d) => {
      import graft.functions.TextFunctions.tokens
      val postings = t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(tokens(lower(col("text")))).as(Seq("pos0", "term")))
        .select(col("doc_id"), col("term"),
          (col("pos0") + 1).cast("long").as("pos"))
      val first = postings.filter(col("term") === "fast")
        .select(col("doc_id"), col("pos"))
      val second = postings.filter(col("term") === "spark")
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      first.join(second, Seq("doc_id", "pos"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"), min(col("pos")).as("first_pos"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH p AS (SELECT doc_id,
            unnest(string_split(lower(text), ' ')) AS term,
            CAST(generate_subscripts(string_split(lower(text), ' '), 1)
              AS BIGINT) AS pos
          FROM documents),
        a AS (SELECT doc_id, pos FROM p WHERE term = 'fast'),
        b AS (SELECT doc_id, pos - 1 AS pos FROM p WHERE term = 'spark')
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
             min(pos) AS first_pos
      FROM a JOIN b USING (doc_id, pos)
      GROUP BY doc_id ORDER BY doc_id"""),
    note = "phrase query = postings equi-join on (doc, adjacent pos); " +
      "probe cost bounded by term frequency, not corpus size")

  /** q150 — percolation / reverse search (the Elasticsearch "percolator"
    * operation): a registry of STORED queries is matched against the
    * incoming document stream — the alerting/routing primitive (which
    * saved searches does this new document satisfy?). Inverts q90/q142:
    * there the query is one-off and the corpus is indexed; here the
    * queries are the standing table. Stored queries are derived
    * deterministically from the corpus itself (top-16 tokens paired
    * rank i with rank i+8 → 8 two-term conjunctive queries) so the whole
    * thing hash-checks with no side input.
    *
    * Scale shape: THE percolator shape — the stored-query term table is
    * rule-registry-sized and broadcasts; the document stream is touched
    * ONCE (distinct doc-term pairs → broadcast join → per-(query, doc)
    * term-count == required-count). Nothing but the stream scan grows
    * with corpus size, and the same dataflow runs under Structured
    * Streaming for true alerting. */
  val q150 = GraftQuery(
    "q150_percolate_stored_queries",
    (s, d) => {
      // r14: one checkpointed corpus pass for registry + probe (see q151)
      val docTok = docTokens(s, d).localCheckpoint()
      val top = docTok.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("tok")).limit(16)
        .withColumn("rn",
          row_number().over(Window.orderBy(col("df").desc, col("tok")))
            .cast("long"))
      val stored = top.filter(col("rn") <= 8)
        .select(col("rn").as("qid"), col("tok").as("term1"))
        .join(top.filter(col("rn") > 8)
          .select((col("rn") - 8).as("qid"), col("tok").as("term2")), Seq("qid"))
        // r14: one materialization for all consumer branches — see
        // storedQueriesMulti
        .localCheckpoint()
      val terms = stored.select(col("qid"), col("term1").as("tok"))
        .union(stored.select(col("qid"), col("term2").as("tok")))
      val matched = docTok.join(broadcast(terms), Seq("tok"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(count(lit(1)).as("hits"))
        .filter(col("hits") === 2)
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_matching_docs"))
      stored.join(matched, Seq("qid"), "left")
        .select(col("qid"), col("term1"), col("term2"),
          coalesce(col("n_matching_docs"), lit(0L)).as("n_matching_docs"))
        .orderBy(col("qid"))
    },
    Some("""WITH dt AS (SELECT DISTINCT doc_id,
            unnest(string_split(lower(text), ' ')) AS tok
          FROM documents),
        top AS (SELECT tok, CAST(row_number() OVER
                  (ORDER BY count(*) DESC, tok) AS BIGINT) AS rn
                FROM dt GROUP BY tok
                ORDER BY count(*) DESC, tok LIMIT 16),
        stored AS (SELECT a.rn AS qid, a.tok AS term1, b.tok AS term2
                   FROM top a JOIN top b ON b.rn = a.rn + 8
                   WHERE a.rn <= 8),
        terms AS (SELECT qid, term1 AS tok FROM stored
                  UNION ALL SELECT qid, term2 FROM stored),
        m AS (SELECT t.qid, dt.doc_id
              FROM dt JOIN terms t ON t.tok = dt.tok
              GROUP BY t.qid, dt.doc_id HAVING count(*) = 2),
        agg AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_matching_docs
                FROM m GROUP BY qid)
      SELECT s.qid, s.term1, s.term2,
             coalesce(agg.n_matching_docs, 0) AS n_matching_docs
      FROM stored s LEFT JOIN agg USING (qid)
      ORDER BY qid"""),
    note = "reverse search: rule registry broadcasts, document stream " +
      "touched once; the alerting dataflow")

  /** Distinct (doc_id, token) pairs of the document corpus — the
    * percolator family's stream-side projection. */
  def docTokens(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    t(s, d, "documents")
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("tok"))
      .distinct()
  }

  /** Deterministic MIXED-ARITY stored-query registry (q151 + the
    * streaming percolator, VERDICT r7 #5): real rule registries mix
    * arities, so q150's hard-coded two-term/hits==2 shape generalizes to
    * per-query `n_required`. Derived from the corpus itself (no side
    * input): top-18 tokens by document frequency ranked 1..18; query
    * `qid` (1..6) carries the rank-qid term, plus rank qid+6 when its
    * arity ≥ 2 and rank qid+12 when arity ≥ 3, with arity =
    * ((qid-1) % 3) + 1 — so the registry holds two 1-term, two 2-term
    * and two 3-term conjunctive queries. Returns
    * (qid, n_required, term1, term2, term3) with NULL for absent terms
    * (internal only — every REGISTRY OUTPUT built from this coalesces
    * to the null-free house form). */
  def storedQueriesMulti(s: SparkSession, d: String): DataFrame =
    storedQueriesMultiFrom(docTokens(s, d))

  /** As [[storedQueriesMulti]] but over a caller-supplied (doc_id, tok)
    * projection — r14: the registry queries materialize docTokens ONCE
    * (localCheckpoint) and feed the SAME table to the registry derivation
    * and the probe join, so the corpus explode+distinct runs once per
    * query instead of once per consumer branch. */
  private[graft] def storedQueriesMultiFrom(docTok: DataFrame): DataFrame = {
    val top = docTok.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(18)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("df").desc, col("tok")))
          .cast("long"))
    val spine = top.filter(col("rn") <= 6)
      .select(col("rn").as("qid"), col("tok").as("term1"),
        (((col("rn") - 1) % 3) + 1).as("n_required"))
    val t2 = top.filter(col("rn").between(7, 12))
      .select((col("rn") - 6).as("qid"), col("tok").as("term2"))
    val t3 = top.filter(col("rn") >= 13)
      .select((col("rn") - 12).as("qid"), col("tok").as("term3"))
    spine.join(t2, Seq("qid")).join(t3, Seq("qid"))
      .select(col("qid"), col("n_required"), col("term1"),
        when(col("n_required") >= 2, col("term2")).as("term2"),
        when(col("n_required") >= 3, col("term3")).as("term3"))
      // r14: materialize the 6-row registry once. Every consumer branch
      // (terms union ×3, the n_required join, the final projection) used
      // to re-derive it, and each re-derivation re-ran the corpus-sized
      // docTokens distinct + top-18 window — per-branch pushed filters
      // defeat ReuseExchange, so q151's plan held 16 parquet scans of
      // documents. Rule registries are metadata; one checkpoint is the
      // batch analog of loading them once (q119's 8-row merge table
      // collect is the same discipline).
      .localCheckpoint()
  }

  /** q151 — mixed-arity percolation: q150's reverse search with a
    * per-query required-term count. Same percolator scale shape — the
    * registry's term table broadcasts, the document stream is touched
    * once, and the per-(query, doc) verdict is `hits == n_required`
    * instead of a hard-coded 2. [[graft.streaming.StreamingOps
    * .percolateStream]] runs the identical match against a document
    * MemoryStream (StreamingSpec pins batch parity). */
  val q151 = GraftQuery(
    "q151_percolate_multiterm",
    (s, d) => {
      // r14: ONE corpus explode+distinct pass, checkpointed, feeds both
      // the registry derivation and the probe join (was 6 corpus passes —
      // per-branch pushed filters defeat ReuseExchange)
      val docTok = docTokens(s, d).localCheckpoint()
      val stored = storedQueriesMultiFrom(docTok)
      val terms = stored.select(col("qid"), col("term1").as("tok"))
        .union(stored.filter(col("n_required") >= 2)
          .select(col("qid"), col("term2").as("tok")))
        .union(stored.filter(col("n_required") >= 3)
          .select(col("qid"), col("term3").as("tok")))
      val matched = docTok.join(broadcast(terms), Seq("tok"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(count(lit(1)).as("hits"))
        .join(broadcast(stored.select(col("qid"), col("n_required"))),
          Seq("qid"))
        .filter(col("hits") === col("n_required"))
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_matching_docs"))
      stored.join(matched, Seq("qid"), "left")
        .select(col("qid"), col("n_required"),
          concat_ws(",", col("term1"), col("term2"), col("term3"))
            .as("terms"),
          coalesce(col("n_matching_docs"), lit(0L)).as("n_matching_docs"))
        .orderBy(col("qid"))
    },
    Some("""WITH dt AS (SELECT DISTINCT doc_id,
            unnest(string_split(lower(text), ' ')) AS tok
          FROM documents),
        top AS (SELECT tok, CAST(row_number() OVER
                  (ORDER BY count(*) DESC, tok) AS BIGINT) AS rn
                FROM dt GROUP BY tok
                ORDER BY count(*) DESC, tok LIMIT 18),
        spine AS (SELECT rn AS qid, tok AS term1,
                    ((rn - 1) % 3) + 1 AS n_required
                  FROM top WHERE rn <= 6),
        s2 AS (SELECT rn - 6 AS qid, tok AS term2 FROM top
               WHERE rn BETWEEN 7 AND 12),
        s3 AS (SELECT rn - 12 AS qid, tok AS term3 FROM top WHERE rn >= 13),
        stored AS (SELECT q.qid, q.n_required, q.term1,
                     CASE WHEN q.n_required >= 2 THEN s2.term2 END AS term2,
                     CASE WHEN q.n_required >= 3 THEN s3.term3 END AS term3
                   FROM spine q JOIN s2 USING (qid) JOIN s3 USING (qid)),
        terms AS (SELECT qid, term1 AS tok FROM stored
                  UNION ALL SELECT qid, term2 FROM stored WHERE n_required >= 2
                  UNION ALL SELECT qid, term3 FROM stored WHERE n_required >= 3),
        hits AS (SELECT t.qid, dt.doc_id, CAST(count(*) AS BIGINT) AS hits
                 FROM dt JOIN terms t ON t.tok = dt.tok
                 GROUP BY t.qid, dt.doc_id),
        m AS (SELECT h.qid, h.doc_id FROM hits h
              JOIN stored s ON s.qid = h.qid
              WHERE h.hits = s.n_required),
        agg AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_matching_docs
                FROM m GROUP BY qid)
      SELECT s.qid, s.n_required,
             concat_ws(',', s.term1, s.term2, s.term3) AS terms,
             coalesce(agg.n_matching_docs, 0) AS n_matching_docs
      FROM stored s LEFT JOIN agg USING (qid)
      ORDER BY qid"""),
    note = "mixed-arity percolation: hits == per-query n_required; " +
      "registry broadcasts, stream scanned once; streaming form = " +
      "StreamingOps.percolateStream")

  /** Stored-query registry WITH NEGATION (q155 + streaming): six rules
    * "contains A AND B AND NOT C" — required terms from ranks qid/qid+6,
    * forbidden term from rank qid+12 of the same top-18 derivation as
    * [[storedQueriesMulti]]. Returns (qid, term1, term2, not_term). */
  def storedQueriesNeg(s: SparkSession, d: String): DataFrame =
    storedQueriesNegFrom(docTokens(s, d))

  /** As [[storedQueriesNeg]] over a caller-supplied projection — see
    * [[storedQueriesMultiFrom]]. */
  private[graft] def storedQueriesNegFrom(docTok: DataFrame): DataFrame = {
    val top = docTok.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(18)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("df").desc, col("tok")))
          .cast("long"))
    top.filter(col("rn") <= 6)
      .select(col("rn").as("qid"), col("tok").as("term1"))
      .join(top.filter(col("rn").between(7, 12))
        .select((col("rn") - 6).as("qid"), col("tok").as("term2")), Seq("qid"))
      .join(top.filter(col("rn") >= 13)
        .select((col("rn") - 12).as("qid"), col("tok").as("not_term")),
        Seq("qid"))
      // r14: one materialization for all consumer branches — see
      // storedQueriesMulti
      .localCheckpoint()
  }

  /** q155 — percolation with NEGATION: stored queries of the form
    * "contains A AND B AND NOT C" — the exclusion clause every real rule
    * registry carries (spam rules, routing rules: match X unless Y).
    * The NOT is the percolator-scale ANTI-JOIN: forbidden-term matches
    * are bounded by the forbidden term's document frequency (never
    * corpus-cross), subtracted from the conjunctive matches by key —
    * U1's anti-membership composed into the q150/q151 dataflow. The
    * document stream is still touched ONCE (both the required and
    * forbidden probes read the same distinct doc-term projection).
    * Streaming form: [[graft.streaming.StreamingOps.percolateStream]]
    * handles a `not_terms` registry column with the same stateless
    * per-doc check. */
  val q155 = GraftQuery(
    "q155_percolate_negation",
    (s, d) => {
      // r14: one checkpointed corpus pass for registry + both probes
      // (was 7 — see q151)
      val docTok = docTokens(s, d).localCheckpoint()
      val stored = storedQueriesNegFrom(docTok)
      val req = stored.select(col("qid"), col("term1").as("tok"))
        .union(stored.select(col("qid"), col("term2").as("tok")))
      val fired = docTok.join(broadcast(req), Seq("tok"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(count(lit(1)).as("hits"))
        .filter(col("hits") === 2)
        .join(docTok.join(broadcast(
            stored.select(col("qid"), col("not_term").as("tok"))), Seq("tok"))
          .select(col("qid"), col("doc_id")),
          Seq("qid", "doc_id"), "left_anti")
      stored.join(
          fired.groupBy(col("qid")).agg(count(lit(1)).as("n_matching_docs")),
          Seq("qid"), "left")
        .select(col("qid"), col("term1"), col("term2"), col("not_term"),
          coalesce(col("n_matching_docs"), lit(0L)).as("n_matching_docs"))
        .orderBy(col("qid"))
    },
    Some("""WITH dt AS (SELECT DISTINCT doc_id,
            unnest(string_split(lower(text), ' ')) AS tok
          FROM documents),
        top AS (SELECT tok, CAST(row_number() OVER
                  (ORDER BY count(*) DESC, tok) AS BIGINT) AS rn
                FROM dt GROUP BY tok
                ORDER BY count(*) DESC, tok LIMIT 18),
        stored AS (SELECT a.rn AS qid, a.tok AS term1, b.tok AS term2,
                     c.tok AS not_term
                   FROM top a
                     JOIN top b ON b.rn = a.rn + 6
                     JOIN top c ON c.rn = a.rn + 12
                   WHERE a.rn <= 6),
        req AS (SELECT qid, term1 AS tok FROM stored
                UNION ALL SELECT qid, term2 FROM stored),
        conj AS (SELECT r.qid, dt.doc_id
                 FROM dt JOIN req r ON r.tok = dt.tok
                 GROUP BY r.qid, dt.doc_id HAVING count(*) = 2),
        forb AS (SELECT s.qid, dt.doc_id
                 FROM dt JOIN stored s ON s.not_term = dt.tok),
        fired AS (SELECT c.qid, c.doc_id FROM conj c
                  LEFT JOIN forb f
                    ON f.qid = c.qid AND f.doc_id = c.doc_id
                  WHERE f.doc_id IS NULL),
        agg AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_matching_docs
                FROM fired GROUP BY qid)
      SELECT s.qid, s.term1, s.term2, s.not_term,
             coalesce(agg.n_matching_docs, 0) AS n_matching_docs
      FROM stored s LEFT JOIN agg USING (qid)
      ORDER BY qid"""),
    note = "percolation with exclusion: NOT = anti-join bounded by the " +
      "forbidden term's document frequency; same one-scan stream shape")

  /** Schema-validated EXTERNAL rule registry (VERDICT r8 #7): q150/q151/
    * q155 derive their stored queries deterministically from corpus token
    * ranks — right for oracle checking, but a production registry arrives
    * as DATA. This entry point canonicalizes a user-supplied DataFrame to
    * the (qid, n_required, terms, not_terms) contract shared by
    * [[percolate]] (batch) and
    * [[graft.streaming.StreamingOps.percolateStream]], and REJECTS a
    * malformed registry loudly at registration time: a rule registry is
    * registry-sized, so the validation pass is one bounded driver
    * action, and failing here beats silently never-firing alerts at
    * match time.
    *
    * Accepted input: `qid` (integral), `terms` (array<string>), optional
    * `n_required` (defaults to size(terms) — plain conjunction),
    * optional `not_terms` (defaults to empty). Constraints: qids
    * non-null and distinct; terms non-empty, distinct, lowercase,
    * whitespace-free; 1 <= n_required <= size(terms) (the q151
    * exact-n contract); terms ∩ not_terms empty (a rule requiring and
    * forbidding the same term can never fire). */
  def validatedRegistry(raw: DataFrame): DataFrame = {
    val cols = raw.columns.toSet
    require(cols.contains("qid") && cols.contains("terms"),
      s"registry needs qid + terms columns, got ${raw.columns.toSeq}")
    val reg = raw
      .withColumn("qid", col("qid").cast("long"))
      .withColumn("terms", col("terms").cast("array<string>"))
      .withColumn("n_required",
        (if (cols.contains("n_required")) col("n_required")
         else size(col("terms"))).cast("long"))
      // coalesce AFTER the cast: a row-level NULL not_terms (not just an
      // absent column) must canonicalize to empty — a NULL array makes
      // the stream's array_intersect guard NULL-drop every doc while the
      // batch explode fires the rule, the exact silent divergence this
      // entry point exists to prevent
      .withColumn("not_terms",
        coalesce((if (cols.contains("not_terms")) col("not_terms")
                  else array()).cast("array<string>"),
          array().cast("array<string>")))
      .select(col("qid"), col("n_required"), col("terms"), col("not_terms"))
    def n(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val badTerm = (t: org.apache.spark.sql.Column) =>
      t.isNull || t === "" || t =!= lower(t) || t.contains(" ")
    val audit = reg.agg(
      n(col("qid").isNull).as("null qid"),
      // count(col) skips nulls, so a NULL qid is reported once (above),
      // not double-reported as a phantom duplicate
      (count(col("qid")) - countDistinct(col("qid"))).as("duplicate qid"),
      n(col("terms").isNull || size(col("terms")) === 0).as("empty terms"),
      n(size(array_distinct(col("terms"))) =!= size(col("terms")))
        .as("duplicate terms in a rule"),
      n(exists(col("terms"), badTerm) ||
        exists(col("not_terms"), badTerm))
        .as("term not lowercase/whitespace-free"),
      n(col("n_required").isNull || col("n_required") < 1 ||
        col("n_required") > size(col("terms"))).as("n_required out of range"),
      n(size(array_intersect(col("terms"), col("not_terms"))) > 0)
        .as("terms overlap not_terms")).head()
    val violations = audit.schema.fieldNames.zipWithIndex
      .map { case (f, i) => f -> (if (audit.isNullAt(i)) 0L else audit.getLong(i)) }
      .filter(_._2 > 0)
    require(violations.isEmpty,
      "registry rejected: " + violations
        .map { case (f, c) => s"$f ($c rules)" }.mkString("; "))
    reg
  }

  /** Batch percolation over an arbitrary [[validatedRegistry]] — the
    * q151/q155 dataflow generalized from the derived corpus registry to
    * user data. Scale shape unchanged: the registry's exploded term
    * table broadcasts, the document stream is tokenized and touched
    * ONCE, the verdict is `|tokens ∩ terms| == n_required` (q151's
    * exact-n contract) minus the forbidden-term anti-join (q155's NOT,
    * bounded by the forbidden terms' document frequency). Emits one
    * (doc_id, qid) row per fired rule — the same semantics
    * [[graft.streaming.StreamingOps.percolateStream]] applies per
    * micro-batch (parity pinned in StreamingSpec). */
  def percolate(docs: DataFrame, registry: DataFrame): DataFrame = {
    val reg = validatedRegistry(registry)
    val docTok = docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.TextFunctions
        .tokens(lower(col("text"))))).as("tok"))
    val conj = docTok
      .join(broadcast(reg.select(col("qid"), explode(col("terms")).as("tok"))),
        Seq("tok"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("hits"))
      .join(broadcast(reg.select(col("qid"), col("n_required"))), Seq("qid"))
      .filter(col("hits") === col("n_required"))
      .select(col("qid"), col("doc_id"))
    val forb = docTok
      .join(broadcast(
        reg.select(col("qid"), explode(col("not_terms")).as("tok"))),
        Seq("tok"))
      .select(col("qid"), col("doc_id"))
    conj.join(forb, Seq("qid", "doc_id"), "left_anti")
      .select(col("doc_id"), col("qid"))
  }

  val all: Seq[GraftQuery] = Seq(q130, q142, q150, q151, q155)
}
