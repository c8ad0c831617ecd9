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
    *
    * Oracle (closes the long-standing rows-only gap): the SQL twin
    * re-implements difflib's SequenceMatcher EXACTLY in DuckDB — candidates
    * are bounded first by a Levenshtein prefilter (ratio >= 0.85 implies
    * lev <= la+lb-2M <= 0.15*(la+lb), since unit-cost lev <= la+lb-2*LCS
    * and LCS >= R/O's matched total; +1 margin for the rounding edge),
    * then a recursive CTE replays the R/O recursion per candidate pair:
    * equal-char cells -> maximal diagonal runs (gaps-and-islands: a run
    * START is a cell whose previous diagonal cell mismatches or sits on
    * the window edge), difflib's tie-break encoded as arg_min over
    * (-len, end_i, start_j) — the first maximal block in (i, j) scan
    * order, exactly find_longest_match's strictly-greater update — and
    * each level emits the matched length plus the left/right sub-windows.
    * ratio = (2.0 * M) / (la + lb) is the same int/int double in the same
    * operation order as both difflib and StringRatio.scala — bit-exact,
    * no rounding needed (verified: all survivors byte-identical at
    * sf0.01). The expression is additionally pinned to difflib goldens in
    * FunctionsSpec. */
  private val q46 = GraftQuery(
    "q46_ratcliff_fuzzy_pairs",
    (s, d) => {
      // blocking key (brand, type) bounds the quadratic pair count —
      // the same blocked-self-join shape as the reference's year band.
      // The (brand, type) enum does NOT grow with data, so past the
      // crossover (big blocks × dictionary-shaped p_name) the kernel runs
      // once per distinct ORIENTED name pair and expands back to row
      // pairs — value-identical by construction (DistinctPairJoin),
      // pinned by DistinctPairJoinSpec's both-paths agreement test.
      val p = t(s, d, "part")
      val expand = DistinctPairJoin.expansionWins(
        Tables.cachedDistinctCount(s, d, "part", "p_name"),
        Tables.cachedRowCount(s, d, "part"),
        Tables.cachedMaxBlockRows(s, d, "part", Seq("p_brand", "p_type")))
      val surv =
        if (expand) {
          val rows = p.select(col("p_brand"), col("p_type"),
            col("p_partkey"), lower(col("p_name")).as("nl"))
          DistinctPairJoin.expandBlockedSelfJoin(rows, "p_partkey", "nl",
              Seq("p_brand", "p_type")) { pairs =>
            // same kernel expressions as the row-pair branch below, so the
            // StringRatioBoundRule swap and the recomputed ratio are
            // identical per string pair
            pairs.filter(string_ratio(col("a_str"), col("b_str")) >= 0.85)
              .withColumn("ratio", string_ratio(col("a_str"), col("b_str")))
          }.select(col("p_brand"), col("a_key"), col("b_key"), col("ratio"))
        } else {
          // spread the quadratic ratio scan across cores (single-split
          // input). lower() is hoisted into the per-ROW projection: inside
          // the join condition it would allocate two lowered copies per
          // PAIR — 13.4B pairs at sf10 made that the dominant cost of the
          // whole query.
          val a = p.repartition(s.sparkContext.defaultParallelism)
            .select(col("p_brand"), col("p_type"), col("p_partkey").as("a_key"),
            lower(col("p_name")).as("a_nl"))
          val b = p.select(col("p_brand"), col("p_type"), col("p_partkey").as("b_key"),
            lower(col("p_name")).as("b_nl"))
          a.join(b, Seq("p_brand", "p_type"))
            .filter(col("a_key") < col("b_key"))
            // The literal-threshold filter matches StringRatioBoundRule's
            // `string_ratio >= lit` pattern, so the optimizer swaps in
            // StringRatioGte and difflib's real_quick/quick bounds refute most
            // pairs without the O(n·m) DP; survivors recompute the full ratio.
            .filter(string_ratio(col("a_nl"), col("b_nl")) >= 0.85)
            .withColumn("ratio", string_ratio(col("a_nl"), col("b_nl")))
            .select(col("p_brand"), col("a_key"), col("b_key"), col("ratio"))
        }
      // survivors are output-sized; materialize them ONCE before the
      // global sort — the range partitioner's sampling pass otherwise
      // re-executes the whole pair generation + kernel. SERIALIZED
      // blocks (the q154/GraphOps sf100 lesson): at 1000x the survivor
      // set is ~26M rows, and deserialized unroll under allocation
      // pressure can evict local-checkpoint blocks, which are
      // unrecoverable by design — compact bytes spill predictably.
      surv.localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        .orderBy(col("p_brand"), col("a_key"), col("b_key"))
    },
    Some("""WITH RECURSIVE
      cand AS (
        SELECT a.p_brand, a.p_partkey AS a_key, b.p_partkey AS b_key,
               lower(a.p_name) AS sa, lower(b.p_name) AS sb,
               len(a.p_name) AS la, len(b.p_name) AS lb
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_type = b.p_type
         AND a.p_partkey < b.p_partkey
        WHERE levenshtein(lower(a.p_name), lower(b.p_name))
              <= CAST(floor(0.15 * (len(a.p_name) + len(b.p_name))) AS INT) + 1
      ),
      seg AS (
        SELECT a_key, b_key, sa, sb,
               1 AS alo, CAST(la + 1 AS INT) AS ahi,
               1 AS blo, CAST(lb + 1 AS INT) AS bhi, 0 AS k
        FROM cand
        UNION ALL
        SELECT a_key, b_key, sa, sb,
               CAST(c.r['alo'] AS INT), CAST(c.r['ahi'] AS INT),
               CAST(c.r['blo'] AS INT), CAST(c.r['bhi'] AS INT),
               CAST(c.r['k'] AS INT)
        FROM (
          SELECT a_key, b_key, sa, sb, alo, ahi, blo, bhi,
                 arg_min(i,  -k2 * 1000000 + (i + k2 - 1) * 1000 + j) AS bi,
                 arg_min(j,  -k2 * 1000000 + (i + k2 - 1) * 1000 + j) AS bj,
                 arg_min(k2, -k2 * 1000000 + (i + k2 - 1) * 1000 + j) AS bk
          FROM (
            SELECT sij.*,
              CAST(coalesce(
                list_min(list_filter(range(0, least(ahi - i, bhi - j)),
                  d -> substr(sa, CAST(i + d AS INT), 1)
                    <> substr(sb, CAST(j + d AS INT), 1))),
                least(ahi - i, bhi - j)) AS INT) AS k2
            FROM (
              SELECT si.*, CAST(unnest(range(si.blo, si.bhi)) AS INT) AS j
              FROM (
                SELECT s.*, CAST(unnest(range(s.alo, s.ahi)) AS INT) AS i
                FROM seg s
                WHERE s.k = 0 AND s.ahi > s.alo AND s.bhi > s.blo
              ) si
            ) sij
            WHERE substr(sa, i, 1) = substr(sb, j, 1)
              AND (i = alo OR j = blo
                   OR substr(sa, i - 1, 1) <> substr(sb, j - 1, 1))
          )
          GROUP BY a_key, b_key, sa, sb, alo, ahi, blo, bhi
        ) g,
        LATERAL unnest([
            {'alo': 0, 'ahi': 0, 'blo': 0, 'bhi': 0, 'k': g.bk},
            {'alo': g.alo, 'ahi': g.bi, 'blo': g.blo, 'bhi': g.bj, 'k': 0},
            {'alo': g.bi + g.bk, 'ahi': g.ahi,
             'blo': g.bj + g.bk, 'bhi': g.bhi, 'k': 0}
        ]) c(r)
        WHERE c.r['k'] > 0 OR (c.r['ahi'] > c.r['alo'] AND c.r['bhi'] > c.r['blo'])
      )
      SELECT p_brand, a_key, b_key, ratio FROM (
        SELECT c.p_brand, s.a_key, s.b_key,
               2.0 * sum(s.k) / (c.la + c.lb) AS ratio
        FROM seg s JOIN cand c ON s.a_key = c.a_key AND s.b_key = c.b_key
        GROUP BY c.p_brand, s.a_key, s.b_key, c.la, c.lb)
      WHERE ratio >= 0.85
      ORDER BY p_brand, a_key, b_key"""))

  /** The reference's relaxed-threshold near-miss debug scan
    * (movie_generator.py:629-648: report every corpus entry with
    * SequenceMatcher ratio > 0.7 — BELOW the 0.85 dedup cut — so a human
    * can see why something was or wasn't deduped), run corpus-wide as the
    * same blocked self-join as q46. Oracle discipline: the pair set is
    * gated on the normalized-levenshtein twin metric (exact int/int
    * division → bit-identical doubles in both engines, so both the 0.7
    * comparison and the sim-ordered output hash-match); the
    * Ratcliff/Obershelp form of the same scan is q46, pinned to difflib
    * goldens in FunctionsSpec. */
  private val q77 = GraftQuery(
    "q77_fuzzy_near_miss_debug",
    (s, d) => {
      val p = t(s, d, "part")
      // Banded-DP bound from one corpus scalar: sim > 0.7 needs
      // lev < 0.3·max(len), and max(len) <= g corpus-wide, so the banded
      // thresholded levenshtein with T = (3g-1) div 10 returns the exact
      // distance for every possible survivor and -1 (O(T·n) with early
      // exit, vs the full O(n²) DP) for pairs it is safe to reject:
      // lev >= T+1 >= 0.3g >= 0.3·max(len_a,len_b) ⟹ sim <= 0.7,
      // and the filter is strictly > 0.7.
      val g = p.agg(max(length(col("p_name"))).cast("int")).head().getInt(0)
      val bound = math.max(1, (3 * g - 1) / 10)
      // dictionary-column escape hatch, same crossover as q46: the
      // (brand, type) block key is scale-invariant, so at big scale the
      // banded-levenshtein kernel runs over distinct name pairs and the
      // survivors expand back to row pairs (DistinctPairJoin).
      val expand = DistinctPairJoin.expansionWins(
        Tables.cachedDistinctCount(s, d, "part", "p_name"),
        Tables.cachedRowCount(s, d, "part"),
        Tables.cachedMaxBlockRows(s, d, "part", Seq("p_brand", "p_type")))
      def kernel(df: org.apache.spark.sql.DataFrame,
                 aCol: String, bCol: String) = df
        .withColumn("lev",
          graft.functions.expressions.LevenshteinK
            .levenshtein_k(col(aCol), col(bCol), bound))
        .filter(col("lev") >= 0)
        .withColumn("sim", lit(1.0) - col("lev").cast("double") /
          greatest(length(col(aCol)), length(col(bCol))))
        .filter(col("sim") > 0.7)
      val surv =
        if (expand) {
          val rows = p.select(col("p_brand"), col("p_type"),
            col("p_partkey"), lower(col("p_name")).as("nl"))
          DistinctPairJoin.expandBlockedSelfJoin(rows, "p_partkey", "nl",
              Seq("p_brand", "p_type")) { pairs =>
            kernel(pairs, "a_str", "b_str")
          }.select(col("p_brand"), col("a_key"), col("b_key"), col("sim"))
        } else {
          // lower() hoisted to the per-ROW projection (see q46: per-PAIR
          // lowering allocated two copies per candidate — the dominant cost
          // at sf10's 13.4B pairs); length(lower(x)) = length(x), so the sim
          // denominator reads the lowered column's length directly.
          val a = p.repartition(s.sparkContext.defaultParallelism)
            .select(col("p_brand"), col("p_type"), col("p_partkey").as("a_key"),
              lower(col("p_name")).as("a_nl"))
          val b = p.select(col("p_brand"), col("p_type"), col("p_partkey").as("b_key"),
            lower(col("p_name")).as("b_nl"))
          kernel(
            a.join(b, Seq("p_brand", "p_type"))
              .filter(col("a_key") < col("b_key")), "a_nl", "b_nl")
            .select(col("p_brand"), col("a_key"), col("b_key"), col("sim"))
        }
      // output-sized survivor set, materialized once before the global
      // sort (same rationale as q46's checkpoint)
      surv.localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        .orderBy(col("sim").desc, col("a_key"), col("b_key"))
    },
    Some("""SELECT p_brand, a_key, b_key, sim FROM (
      SELECT a.p_brand, a.p_partkey AS a_key, b.p_partkey AS b_key,
        1.0 - CAST(levenshtein(lower(a.p_name), lower(b.p_name)) AS DOUBLE) /
          greatest(length(lower(a.p_name)), length(lower(b.p_name))) AS sim
      FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_type = b.p_type
        AND a.p_partkey < b.p_partkey)
      WHERE sim > 0.7
      ORDER BY sim DESC, a_key, b_key"""))

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

  /** G3 — the generate-with-retry loop's batch analog (movie_generator.py:
    * 182-238: request a batch, reject dups against the corpus, retry up to
    * 8 attempts until `target` accepted): in batch dataflow the retry
    * becomes OVERSAMPLE → dedup (exact key anti-join + fuzzy band-join,
    * both vs the seen corpus AND within the batch) → cut to target. One
    * declarative pass instead of a driver-side loop — at scale the
    * oversample factor plays the role of the attempt budget.
    *
    * "Generated" candidates are derived deterministically from documents
    * (title = two leading tokens, synthesized year) with a seen-corpus
    * slice (every 5th doc) so both dedup stages genuinely reject rows;
    * fuzzy uses the normalized-levenshtein metric (bit-exact parity — the
    * Ratcliff form of the same band join is MoviePipeline.dedupFuzzy). */
  private val q78 = GraftQuery(
    "q78_oversample_dedup_limit",
    (s, d) => {
      import graft.functions.TextFunctions.{levRatio, normKey}
      import org.apache.spark.sql.expressions.Window
      val target = 100; val oversample = 3
      val toks = split(col("text"), " ")
      val shaped = t(s, d, "documents").select(
        col("doc_id"),
        concat_ws(" ", element_at(toks, 1), element_at(toks, 2)).as("title"),
        (lit(1950) + col("doc_id") % 60).cast("int").as("year"))
      val cand = shaped.orderBy(col("doc_id")).limit(target * oversample)
      val seen = shaped.filter(col("doc_id") % 5 === 0)
        .select(col("title"), col("year"))
      // exact-key rejection vs corpus (movie_generator.py:201-204)
      val exactFresh = MoviePipeline.dedupExact(cand, seen)
      // fuzzy rejection vs corpus: ±1-year band as a 2-year-bucket
      // equi-join (the O7 rewrite), normalized-levenshtein >= 0.9
      val cb = exactFresh
        .withColumn("ck", normKey(col("title")))
        .withColumn("bucket", explode(array(
          floor((col("year") - 1) / 2), floor((col("year") + 1) / 2))))
      val sb = seen
        .select(normKey(col("title")).as("sk"), col("year").as("s_year"))
        .withColumn("bucket", floor(col("s_year") / 2))
      val dupIds = cb.join(sb, Seq("bucket"))
        .filter(abs(col("year") - col("s_year")) <= 1)
        .filter(levRatio(col("ck"), col("sk")) >= 0.9)
        .select(col("doc_id")).distinct()
      val fresh = exactFresh.join(dupIds, Seq("doc_id"), "left_anti")
      // batch-internal dedup: first occurrence per key wins, then cut
      val w = Window.partitionBy(normKey(col("title")), col("year"))
        .orderBy(col("doc_id"))
      fresh.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .orderBy(col("doc_id")).limit(target)
        .select(col("doc_id"), col("title"), col("year"))
    },
    Some("""WITH shaped AS (
        SELECT doc_id,
          string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2] AS title,
          CAST(1950 + doc_id % 60 AS INT) AS year
        FROM documents),
      cand AS (SELECT * FROM shaped ORDER BY doc_id LIMIT 300),
      seen AS (SELECT lower(trim(title)) AS sk, year AS s_year
               FROM shaped WHERE doc_id % 5 = 0),
      ex AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
        SELECT 1 FROM seen
        WHERE sk = lower(trim(c.title)) AND s_year = c.year)),
      fz AS (SELECT e.* FROM ex e WHERE NOT EXISTS (
        SELECT 1 FROM seen
        WHERE abs(e.year - s_year) <= 1
          AND 1.0 - CAST(levenshtein(lower(trim(e.title)), sk) AS DOUBLE) /
                greatest(length(lower(trim(e.title))), length(sk)) >= 0.9)),
      uniq AS (SELECT doc_id, title, year,
          row_number() OVER (PARTITION BY lower(trim(title)), year
                             ORDER BY doc_id) AS rn
        FROM fz)
      SELECT doc_id, title, year FROM uniq WHERE rn = 1
      ORDER BY doc_id LIMIT 100"""))

  val all: Seq[GraftQuery] = Seq(q45, q46, q47, q77, q78)
}
