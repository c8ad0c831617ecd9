package graft.operators

import graft.GraftQuery
import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set ASSEMBLY operators — the stage after curation
  * (CurationOps) where cleaned documents become model-ready input:
  * concat-and-chop sequence packing, RAG chunking with overlap,
  * exact-k per-stratum subsampling, Gopher-style repetition filtering,
  * and domain-mixture weighting. Every metric is integer-derived (counts,
  * lengths, md5 buckets) so each op is hash-checked against the DuckDB
  * oracle end to end. All are narrow scans or single-shuffle windows —
  * the shapes that survive 100 TB.
  */
object AssemblyOps {

  /** Context-window budget (tokens) for q99 and chunk geometry for q100. */
  val WindowTokens = 512
  val ChunkChars = 120
  val ChunkStride = 90 // 30-char overlap between adjacent chunks

  /** q99 — GPT-style sequence packing (concat-and-chop): documents are
    * concatenated in stable doc_id order per source stream and chopped
    * into fixed WindowTokens windows; a document's window is determined
    * by the running token count BEFORE it (sum over an ordered window
    * frame). This is the standard pre-training batch-assembly op; the
    * contiguous-fill form is exactly what streaming tokenizers do. Scale
    * shape: ONE shuffle (partition by source, order by doc_id) and a
    * partial-aggregated groupBy on the same key — no driver state, no
    * skew (windows are balanced by construction). Emits per-window
    * occupancy stats, all integers. */
  private val q99 = GraftQuery(
    "q99_sequence_packing",
    (s, d) => {
      val ntok = size(split(col("text"), " ")).cast("long")
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d, "documents")
        .select(col("doc_id"), col("source"), ntok.as("ntok"))
        .withColumn("cum_prev", coalesce(sum(col("ntok")).over(w), lit(0L)))
        .withColumn("window_id",
          floor(col("cum_prev") / lit(WindowTokens)).cast("long"))
        .groupBy(col("source"), col("window_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("window_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"), col("window_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        FROM documents),
      c AS (SELECT doc_id, source, ntok,
          coalesce(sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
        FROM t)
      SELECT source, CAST(cum_prev // $WindowTokens AS BIGINT) AS window_id,
        count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS window_tokens,
        min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM c GROUP BY source, window_id
      ORDER BY source, window_id"""))

  /** q100 — RAG-style document chunking with overlap: fixed ChunkChars
    * character chunks every ChunkStride characters (30-char overlap so no
    * boundary-straddling phrase is lost — the standard retrieval-index
    * prep). Pure per-row map: `sequence` + `posexplode` + `substring`,
    * no shuffle at all; at 100 TB this runs at scan speed and the output
    * is written partition-parallel. Chunk count and offsets are integer
    * arithmetic; the chunk text itself is hash-checked. */
  private val q100 = GraftQuery(
    "q100_chunk_overlap",
    (s, d) => {
      val len = length(col("text"))
      // ceil((len - C) / S) as integer math, clamped at 0 extra chunks
      val extra = floor((greatest(len - lit(ChunkChars), lit(0))
        + lit(ChunkStride - 1)) / lit(ChunkStride)).cast("int")
      t(s, d, "documents")
        .select(col("doc_id"), col("text"), extra.as("extra"))
        .select(col("doc_id"),
          explode(sequence(lit(0), col("extra"))).as("k"), col("text"))
        .select(col("doc_id"), col("k").cast("long").as("chunk_id"),
          (col("k") * ChunkStride + 1).cast("long").as("start"),
          col("text").substr(col("k") * ChunkStride + 1, lit(ChunkChars))
            .as("chunk"))
        .withColumn("chunk_len", length(col("chunk")).cast("long"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, text,
          (greatest(length(text) - $ChunkChars, 0) + ${ChunkStride - 1})
            // $ChunkStride AS extra
        FROM documents)
      SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
        CAST(k * $ChunkStride + 1 AS BIGINT) AS start,
        substr(text, k * $ChunkStride + 1, $ChunkChars) AS chunk,
        CAST(length(substr(text, k * $ChunkStride + 1, $ChunkChars)) AS BIGINT)
          AS chunk_len
      FROM t, unnest(range(0, extra + 1)) AS u(k)
      ORDER BY doc_id, chunk_id"""))

  /** q102 — exact-k per-stratum subsample: within each language stratum,
    * rank documents by an md5-derived pseudo-random order and keep the
    * first K. Complements q82's rate-based sampling with the exact-count
    * form (eval-set construction wants "exactly 50 per language", not
    * "5% of whatever arrives"). Hash-ordering makes it reproducible
    * across runs, engines, and stage retries — rand() is none of those.
    * Scale shape: one shuffle (the per-stratum window); the rank order
    * is data-independent so no skew beyond stratum sizes. */
  private val q102 = GraftQuery(
    "q102_topk_per_stratum_sample",
    (s, d) => {
      val k = 50
      val rk = md5(concat(col("doc_id").cast("string"), lit(":rank")))
      val w = Window.partitionBy(col("lang")).orderBy(rk)
      t(s, d, "documents")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    },
    Some("""SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id FROM (
        SELECT lang, doc_id, row_number() OVER (
          PARTITION BY lang ORDER BY md5(doc_id::VARCHAR || ':rank')) AS rk
        FROM documents)
      WHERE rk <= 50 ORDER BY lang, rk"""))

  /** q103 — Gopher-style repetition filter (the rule family the C4/Gopher
    * cleaning stage applies AFTER q84's length/vocabulary rules):
    * duplicate 3-gram fraction and most-frequent-bigram fraction per
    * document, with the published-threshold verdict. All ratios are
    * int/int divisions → bit-exact across engines. Narrow per-row pass,
    * no shuffle: at 100 TB this is scan-bound, exactly like q84. */
  private val q103 = GraftQuery(
    "q103_repetition_filter",
    (s, d) => {
      import graft.functions.expressions.TokenMetrics.token_metrics
      // All n-gram statistics from the fused single-pass TokenMetrics
      // kernel (see its scaladoc: pure-HOF forms are interpreted and
      // Catalyst re-substitutes staged arrays into consuming lambdas —
      // measured 30 ms/doc naive HOF, ~10 µs fused).
      val staged = t(s, d, "documents")
        .select(col("doc_id"),
          token_metrics(split(col("text"), " ")).as("m"))
        .filter(col("m.n_tokens") >= 3)
      val nTok = col("m.n_tokens")
      val dup3 = lit(1.0) -
        col("m.uniq_trigrams").cast("double") / (nTok - 2)
      val top2 = col("m.top_bigram_count").cast("double") / (nTok - 1)
      staged.select(col("doc_id"), nTok.cast("long").as("n_tokens"),
          round(dup3, 6).as("dup_3gram_frac"),
          round(top2, 6).as("top_2gram_frac"),
          (dup3 > 0.6 || top2 > 0.2).as("flagged"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE len(string_split(text, ' ')) >= 3),
      m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
          1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS DOUBLE)
            / (len(toks) - 2) AS dup3,
          CAST(list_max(list_transform(
              list_distinct(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])),
              b -> len(list_filter(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1]), x -> x = b)))) AS DOUBLE)
            / (len(toks) - 1) AS top2
        FROM t)
      SELECT doc_id, n_tokens, round(dup3, 6) AS dup_3gram_frac,
        round(top2, 6) AS top_2gram_frac,
        (dup3 > 0.6 OR top2 > 0.2) AS flagged
      FROM m ORDER BY doc_id"""))

  /** q104 — domain-mixture weighting: given measured per-source token
    * counts and target mixture shares (the config a pre-training run
    * declares), compute each source's corpus share and the sampling rate
    * that hits the target under a fixed token budget. The rate is ONE
    * division of exact integer products (target·budget vs 1000·actual)
    * so the doubles are bit-identical across engines. Scale shape: one
    * partial-aggregated groupBy over the scan + a broadcast of the
    * 5-row targets table and the 1-row total. */
  private val q104 = GraftQuery(
    "q104_mixture_weights",
    (s, d) => {
      val targets = Seq(("src0", 400), ("src1", 250), ("src2", 200),
        ("src3", 100), ("src4", 50))
      val tDf = s.createDataFrame(targets).toDF("source", "target_permille")
      val ntok = size(split(col("text"), " ")).cast("long")
      val per = t(s, d, "documents")
        .select(col("source"), ntok.as("ntok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      val total = per.agg(sum(col("n_tokens")).as("total_tokens"))
      per.join(broadcast(tDf), Seq("source"))
        .crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("total_tokens"), 6)
            .as("share"),
          round(least(lit(1.0),
            (col("target_permille") * col("total_tokens")).cast("double") /
              (lit(1000L) * col("n_tokens"))), 6).as("sample_rate"))
        .orderBy(col("source"))
    },
    Some("""WITH targets(source, target_permille) AS (
        VALUES ('src0', 400), ('src1', 250), ('src2', 200),
               ('src3', 100), ('src4', 50)),
      per AS (SELECT source, count(*) AS n_docs,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM per)
      SELECT source, n_docs, n_tokens,
        round(CAST(n_tokens AS DOUBLE) / total_tokens, 6) AS share,
        round(least(1.0, CAST(target_permille * total_tokens AS DOUBLE) /
          (1000 * n_tokens)), 6) AS sample_rate
      FROM per JOIN targets USING (source), tot
      ORDER BY source"""))

  /** q106 — the END-TO-END curation pipeline as ONE declarative program:
    * quality rules (q84) → repetition rules (q103) → exact dedup (q30's
    * keep-min-id form) → benchmark decontamination (q85's eval-shingle
    * anti-join) → train/val/test split (q82's md5 buckets) → sequence
    * packing (q99), emitting each surviving document's split and context
    * window. This is the composability proof: every stage is the same
    * Column/DataFrame algebra the individual operators use, fused by
    * Catalyst into narrow maps (quality/repetition/split) + one dedup
    * shuffle + one broadcast anti-join (eval shingles are small by
    * construction) + one packing window — a 100 TB corpus makes exactly
    * three exchanges end to end. The DuckDB twin recomputes the whole
    * chain, so the composed result (not just each stage) is
    * hash-checked. */
  private val q106 = GraftQuery(
    "q106_curation_pipeline_e2e",
    (s, d) => {
      import graft.functions.HashFunctions.shingles
      import graft.functions.expressions.TokenMetrics.token_metrics
      // All n-gram statistics from the fused single-pass TokenMetrics
      // kernel — the pure-HOF form of this filter measured 12 s at sf0.1
      // (interpreted lambdas + Catalyst re-substituting staged arrays
      // into consuming lambdas); the fused kernel runs it in ~1 s.
      val base = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          split(col("text"), " ").as("tk"),
          token_metrics(split(col("text"), " ")).as("m"))
        .filter(col("m.n_tokens") >= 3)
      val nTok = col("m.n_tokens")
      // q84 quality metrics
      val uniq = col("m.uniq_tokens").cast("double") / nTok
      val meanW = (length(col("text")) - nTok + 1).cast("double") / nTok
      val topF = col("m.top_token_count").cast("double") / nTok
      // q103 repetition metrics
      val dup3 = lit(1.0) -
        col("m.uniq_trigrams").cast("double") / (nTok - 2)
      val top2 = col("m.top_bigram_count").cast("double") / (nTok - 1)

      val clean = base
        .filter(nTok >= 20 && uniq >= 0.5 && topF <= 0.2 &&
          meanW.between(3, 6) && dup3 <= 0.6 && top2 <= 0.2)
      // exact dedup: first doc_id per content fingerprint survives
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val ded = clean.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      // decontamination vs the eval slice's shingle set (from ALL docs —
      // the benchmark is external to the cleaning pipeline)
      val evalSh = base.filter(col("doc_id") % 97 === 0)
        .select(explode(shingles(col("tk"))).as("sg")).distinct()
      val contam = ded.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(shingles(col("tk"))).as("sg"))
        .join(broadcast(evalSh), Seq("sg"))
        .select(col("doc_id")).distinct()
      val kept = ded.filter(col("doc_id") % 97 =!= 0)
        .join(contam, Seq("doc_id"), "left_anti")
      // q82 split buckets (no sampling stage here: rates belong to q82)
      val bucket = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":split"))), 1, 8), 16, 10).cast("long") % 10
      val spl = kept.select(col("doc_id"), col("source"), col("lang"),
        nTok.cast("long").as("n_tokens"),
        when(bucket <= 7, lit("train")).when(bucket === 8, lit("val"))
          .otherwise(lit("test")).as("split"))
      // q99 packing per (split, source) stream
      val pw = Window.partitionBy(col("split"), col("source"))
        .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
      spl.withColumn("window_id",
          floor(coalesce(sum(col("n_tokens")).over(pw), lit(0L)) /
            lit(WindowTokens)).cast("long"))
        .select(col("doc_id"), col("source"), col("lang"), col("split"),
          col("window_id"), col("n_tokens"))
        .orderBy(col("doc_id"))
    },
    Some {
      import graft.functions.HashFunctions.shinglesSql
      s"""WITH base AS (SELECT doc_id, source, lang, text,
            string_split(text, ' ') AS toks
          FROM documents WHERE len(string_split(text, ' ')) >= 3),
        m AS (SELECT *, len(toks) AS ntok,
            CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq,
            CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks) AS meanw,
            CAST(list_max(list_transform(list_distinct(toks),
              w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
              / len(toks) AS topf,
            1.0 - CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS DOUBLE)
              / (len(toks) - 2) AS dup3,
            CAST(list_max(list_transform(
              list_distinct(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1])),
              b -> len(list_filter(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i+1]), x -> x = b)))) AS DOUBLE)
              / (len(toks) - 1) AS top2
          FROM base),
        clean AS (SELECT * FROM m
          WHERE ntok >= 20 AND uniq >= 0.5 AND topf <= 0.2
            AND meanw BETWEEN 3 AND 6 AND dup3 <= 0.6 AND top2 <= 0.2),
        ded AS (SELECT * FROM (SELECT *, row_number() OVER (
            PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM clean)
          WHERE rn = 1),
        evs AS (SELECT DISTINCT sg FROM (
          SELECT unnest(${shinglesSql("toks")}) AS sg
          FROM base WHERE doc_id % 97 = 0)),
        contam AS (SELECT DISTINCT doc_id FROM (
            SELECT doc_id, unnest(${shinglesSql("toks")}) AS sg
            FROM ded WHERE doc_id % 97 <> 0) sh
          JOIN evs USING (sg)),
        kept AS (SELECT * FROM ded WHERE doc_id % 97 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contam)),
        spl AS (SELECT doc_id, source, lang, CAST(ntok AS BIGINT) AS n_tokens,
            CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 8))::BIGINT % 10 <= 7
                 THEN 'train'
                 WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 8))::BIGINT % 10 = 8
                 THEN 'val' ELSE 'test' END AS split
          FROM kept)
        SELECT doc_id, source, lang, split,
          CAST(coalesce(sum(n_tokens) OVER (PARTITION BY split, source
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) // $WindowTokens AS BIGINT) AS window_id,
          n_tokens
        FROM spl ORDER BY doc_id"""
    })

  val all: Seq[GraftQuery] = Seq(q99, q100, q102, q103, q104, q106)
}
