package graft.operators

import graft.GraftQuery
import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline needs
  * beyond cleaning/dedup (brief: first-class LLM-pipeline components):
  * PII redaction, vocabulary construction with coverage accounting, and
  * cross-document repeated-span inventory (the exact-substring flavor of
  * dedup from Lee et al. 2021, "Deduplicating Training Data Makes Language
  * Models Better" — arXiv:2107.06499 — re-expressed as n-gram dataflow).
  *
  * All three are scale-shaped: q108 is a pure per-row map (no shuffle);
  * q109's heavy stage is a map-side partial-aggregated wordcount and only
  * the (small) vocabulary reaches the ranking window; q111 is one hash
  * aggregation keyed by the span text.
  */
object CorpusOps {

  /** q108 — PII redaction (the mandatory pre-training privacy scrub).
    * The synthetic corpus has no PII, so the query first plants
    * deterministic doc_id-derived emails/phone numbers (varying presence:
    * doc_id % 3 / % 2) and then scrubs them — redaction is verified
    * end-to-end against the oracle running the same construction+scrub in
    * SQL. Patterns are shared Java-regex/RE2 syntax (no lookaround, no
    * backrefs); Spark's regexp_replace is global by default, DuckDB needs
    * the 'g' flag (SURVEY §5 gotcha). Scale: narrow per-row map — no
    * shuffle, rides whole-stage codegen. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+1-555-[0-9]{4}"
  private val q108 = GraftQuery(
    "q108_pii_scrub",
    (s, d) => {
      val aug = concat(
        col("text"),
        when(col("doc_id") % 3 =!= 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          concat(lit(" tel +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      t(s, d, "documents")
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(emailRe)).cast("long").as("n_emails"),
          regexp_count(col("aug"), lit(phoneRe)).cast("long").as("n_phones"),
          regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("scrubbed"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH a AS (SELECT doc_id,
        text ||
        CASE WHEN doc_id % 3 <> 0
             THEN ' contact user' || doc_id::VARCHAR || '@mail.example.com'
             ELSE '' END ||
        CASE WHEN doc_id % 2 = 0
             THEN ' tel +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             ELSE '' END AS aug
      FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(aug, '$emailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(aug, '$phoneRe')) AS BIGINT) AS n_phones,
        regexp_replace(regexp_replace(aug, '$emailRe', '<EMAIL>', 'g'),
          '$phoneRe', '<PHONE>', 'g') AS scrubbed
      FROM a ORDER BY doc_id"""))

  /** q109 — vocabulary construction with cumulative-coverage accounting
    * (the tokenizer-training prep step: how many corpus tokens do the top
    * K vocabulary entries cover). Scale shape: the corpus-sized stage is
    * the exploded wordcount, which partial-aggregates map-side before one
    * shuffle on the token; the FULL vocabulary (10^8+ rows at web scale)
    * is then reduced by two all-reduce-shaped ops that never funnel it
    * through one task — grand total via a plain scalar agg(sum) and the
    * top 100 via orderBy.limit(100), which Spark plans as
    * TakeOrderedAndProject (per-partition partial top-k, driver merges
    * 100-row heaps). Only the 100 SURVIVORS cross the rank/cumsum window;
    * the cumulative sum over them equals the cumulative sum over the full
    * vocabulary at ranks <= 100 because the ordering key (cnt DESC, token)
    * is total. The one-row total joins back via broadcast. */
  private val q109 = GraftQuery(
    "q109_vocab_coverage",
    (s, d) => {
      val counts = t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("total"))
      val top = counts.orderBy(col("cnt").desc, col("token")).limit(100)
      val w = Window.orderBy(col("cnt").desc, col("token"))
      top
        .withColumn("rank", row_number().over(w))
        .withColumn("cum", sum(col("cnt")).over(w))
        .crossJoin(broadcast(total))
        .select(col("rank").cast("long").as("rank"), col("token"),
          col("cnt").as("freq"),
          round(col("cum").cast("double") / col("total"), 6).as("cum_coverage"))
        .orderBy(col("rank"))
    },
    Some("""WITH c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token),
      r AS (SELECT token, cnt,
              row_number() OVER (ORDER BY cnt DESC, token) AS rank,
              CAST(sum(cnt) OVER () AS BIGINT) AS total,
              CAST(sum(cnt) OVER (ORDER BY cnt DESC, token) AS BIGINT) AS cum
            FROM c)
      SELECT rank, token, cnt AS freq,
        round(CAST(cum AS DOUBLE) / total, 6) AS cum_coverage
      FROM r WHERE rank <= 100 ORDER BY rank"""))

  /** q111 — cross-document repeated-span inventory: every 5-token span
    * occurring in 2+ distinct documents, with document and occurrence
    * counts (exact-substring dedup, Lee et al. 2021 arXiv:2107.06499;
    * the reference's fuzzy joins catch whole-record dups, this catches
    * verbatim passages embedded in otherwise-distinct docs). Scale: one
    * explode + one hash aggregation keyed by the span; the n_docs >= 2
    * filter rides the aggregate. At 100 TB, key the aggregation by
    * xxhash64(span) (8-byte shuffle keys) and re-attach span text for the
    * survivors only — kept as raw text here for engine-portable hashing. */
  private val q111 = GraftQuery(
    "q111_repeated_spans",
    (s, d) => {
      // tk is materialized as an attribute BEFORE the transform so the
      // per-element slice reads an array value instead of re-running
      // split() per span (see HashFunctions.shingles)
      val grams = transform(sequence(lit(1), size(col("tk")) - 4),
        i => concat_ws(" ", slice(col("tk"), i, lit(5))))
      t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("tk", split(col("text"), " "))
        .filter(size(col("tk")) >= 5)
        .select(col("doc_id"), explode(grams).as("span"))
        .groupBy(col("span"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("span"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
              FROM documents),
      g AS (SELECT doc_id, array_to_string(tk[i:i+4], ' ') AS span
            FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 3)) AS i
                  FROM t WHERE len(tk) >= 5))
      SELECT span, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(count(*) AS BIGINT) AS n_occurrences, min(doc_id) AS first_doc
      FROM g GROUP BY span HAVING count(DISTINCT doc_id) >= 2
      ORDER BY span"""))

  /** q112 — temperature-rebalanced domain mixture sampling (the
    * multilingual/multi-domain re-weighting step: small sources are
    * upsampled relative to raw proportions, τ=0.5 here — the classic
    * square-root rebalance). Per-source quota t_i = ceil(sqrt(n_i)·4)
    * derives from the data (one tiny count aggregate, broadcast back);
    * membership is md5-ordered row_number ≤ t_i — deterministic,
    * retry-stable, engine-portable. τ=0.5 keeps pow() as IEEE sqrt
    * (correctly rounded on every engine); arbitrary τ would need the
    * fixed-point treatment the ANN ladder uses. Scale: one shuffle on
    * source for the quota window; the count side is a partial-agg
    * pre-pass. */
  private val q112 = GraftQuery(
    "q112_temperature_mixture",
    (s, d) => {
      val docs = t(s, d, "documents")
      val quotas = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .select(col("source"), col("n_docs"),
          ceil(sqrt(col("n_docs").cast("double")) * 4).cast("long").as("quota"))
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(concat(col("doc_id").cast("string"), lit(":mix"))),
          col("doc_id"))
      docs.join(broadcast(quotas), Seq("source"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("source"), col("quota"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH q AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(ceil(sqrt(count(*)) * 4) AS BIGINT) AS quota
        FROM documents GROUP BY source),
      r AS (SELECT doc_id, d.source, quota,
              row_number() OVER (PARTITION BY d.source
                ORDER BY md5(doc_id::VARCHAR || ':mix'), doc_id) AS rn
            FROM documents d JOIN q ON d.source = q.source)
      SELECT doc_id, source, quota FROM r WHERE rn <= quota
      ORDER BY doc_id"""))

  /** q114 — corpus snapshot diff (data-versioning audit between two
    * corpus releases): FULL OUTER join on the stable id, rows classified
    * added / removed / changed / unchanged by content fingerprint. The
    * two snapshots are deterministic slices of the documents table (old =
    * id%7≠0, new = id%5≠0 with id%11=0 docs "edited") so the whole diff
    * is oracle-checked. Scale: one full-outer hash join on the id —
    * fingerprints (md5) computed map-side, never the text shipped. */
  private val q114 = GraftQuery(
    "q114_corpus_diff",
    (s, d) => {
      val docs = t(s, d, "documents")
      val old = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("old_fp"))
      val neu = docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          md5(concat(col("text"),
            when(col("doc_id") % 11 === 0, " EDITED").otherwise(lit(""))))
            .as("new_fp"))
      old.join(neu, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("old_fp").isNull, "added")
            .when(col("new_fp").isNull, "removed")
            .when(col("old_fp") =!= col("new_fp"), "changed")
            .otherwise("unchanged").as("status"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH old AS (SELECT doc_id, md5(text) AS old_fp
              FROM documents WHERE doc_id % 7 <> 0),
      neu AS (SELECT doc_id,
                md5(text || CASE WHEN doc_id % 11 = 0 THEN ' EDITED'
                                 ELSE '' END) AS new_fp
              FROM documents WHERE doc_id % 5 <> 0)
      SELECT coalesce(old.doc_id, neu.doc_id) AS doc_id,
        CASE WHEN old_fp IS NULL THEN 'added'
             WHEN new_fp IS NULL THEN 'removed'
             WHEN old_fp <> new_fp THEN 'changed'
             ELSE 'unchanged' END AS status
      FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
      ORDER BY doc_id"""))

  /** q126 — repeated-span SCRUB (the apply stage of exact-substring dedup;
    * q111 is the inventory stage): every token position covered by any
    * occurrence of a cross-document duplicated 5-gram is removed and the
    * surviving tokens are reassembled into the scrubbed text. This is what
    * Lee et al. 2021 (arXiv:2107.06499) actually do to the corpus — remove
    * the duplicated substring from all-but-nowhere, not just report it —
    * and it's the step the reference's whole-record dedup
    * (/root/reference/movie_generator.py:83-94) cannot express.
    *
    * Scale shape: the duplicated-span set is q111's hash aggregation (at
    * 100 TB keyed by xxhash64(span) — bounded 8-byte shuffle keys); the
    * coverage join grams⋈dups shuffles on the span (hot spans are bounded:
    * a 5-gram occurs at most once per position, AQE splits the residual
    * skew). Everything position-level stays INSIDE the document row: the
    * covered starts collapse to one per-doc array (one doc_id exchange),
    * and deletion + reassembly are pure array HOFs — no token-level
    * explode, no position-level anti join, no collect_list rebuild. */
  private val q126 = GraftQuery(
    "q126_span_scrub_apply",
    (s, d) => {
      val toksE = split(col("text"), " ")
      val docs = t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), toksE.as("tk"))
      val grams = docs.filter(size(col("tk")) >= 5)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(1), size(col("tk")) - 4),
            i => concat_ws(" ", slice(col("tk"), i, lit(5)))))
            .as(Seq("gpos0", "span")))
      // "2+ distinct docs" as min!=max — one aggregation phase where
      // countDistinct would plan an extra per-key dedup pass
      val dups = grams.groupBy(col("span"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx"))
        .select(col("span"))
      // per-doc covered-position array: starts of duplicated grams,
      // expanded to the 5 positions each occurrence covers
      val covered = grams.join(dups, "span")
        .groupBy(col("doc_id"))
        .agg(array_distinct(flatten(collect_list(
          sequence(col("gpos0") + 1, col("gpos0") + 5)))).as("cov"))
      docs.join(covered, Seq("doc_id"), "left")
        .withColumn("keep", filter(sequence(lit(1), size(col("tk"))),
          i => !coalesce(array_contains(col("cov"), i), lit(false))))
        .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
          size(col("keep")).cast("long").as("n_kept"),
          (size(col("tk")) - size(col("keep"))).cast("long").as("n_removed"),
          concat_ws(" ",
            transform(col("keep"), i => element_at(col("tk"), i)))
            .as("scrubbed"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
              FROM documents),
      p AS (SELECT doc_id, i AS pos, tk[i] AS tok
            FROM t, unnest(range(1, len(tk) + 1)) AS u(i)),
      g AS (SELECT doc_id, i AS start, array_to_string(tk[i:i+4], ' ') AS span
            FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 3)) AS i
                  FROM t WHERE len(tk) >= 5)),
      dup AS (SELECT span FROM g GROUP BY span
              HAVING count(DISTINCT doc_id) >= 2),
      cov AS (SELECT DISTINCT g.doc_id, g.start + o AS pos
              FROM g JOIN dup USING (span), unnest(range(0, 5)) AS u(o)),
      kept AS (SELECT p.doc_id, p.pos, p.tok
               FROM p LEFT JOIN cov ON p.doc_id = cov.doc_id AND p.pos = cov.pos
               WHERE cov.pos IS NULL),
      r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                   string_agg(tok, ' ' ORDER BY pos) AS scrubbed
            FROM kept GROUP BY doc_id)
      SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        CAST(len(tk) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
        coalesce(scrubbed, '') AS scrubbed
      FROM t LEFT JOIN r USING (doc_id) ORDER BY doc_id"""))

  /** q136 — bigram-rarity quality score: the language-model-perplexity
    * proxy of a CCNet-style quality filter (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", arXiv:1911.00359 — their KenLM perplexity bucket, re-expressed
    * as exact-integer corpus statistics so it hash-checks cross-engine).
    * A document whose bigrams are rare IN ITS OWN CORPUS reads as
    * out-of-distribution — the same signal perplexity gives, without a
    * float LM. Score = mean corpus-frequency of the doc's bigrams
    * (integer div) + the fraction of bigrams seen ≤ 10 times (micro
    * units); `keep` applies the filter verdict.
    *
    * Scale shape: the bigram LM is a map-side-combined wordcount bounded
    * by vocabulary² (~1k cells here; ~millions at web scale — still a
    * broadcast), so scoring is ONE fact-table pass: explode → broadcast
    * join → per-doc aggregation, a single doc_id-keyed shuffle. The model
    * itself never rides a fact-sized shuffle — the property that makes
    * this the 100-TB quality pass. */
  val q136 = GraftQuery(
    "q136_bigram_rarity_score",
    (s, d) => {
      import graft.functions.TextFunctions.tokens
      // zip_with over aligned slices, not element_at-in-transform — the
      // captured split() would re-evaluate per element (O(len²) per doc;
      // see HashFunctions.shingles)
      val bg = {
        val toks = tokens(lower(col("text")))
        when(size(toks) >= 2,
          zip_with(
            slice(toks, lit(1), size(toks) - 1),
            slice(toks, lit(2), size(toks) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))
      }
      val docBg = t(s, d, "documents")
        .select(col("doc_id"), explode(bg).as("g"))
      val lm = docBg.groupBy(col("g")).agg(count(lit(1)).as("c"))
      docBg.join(broadcast(lm), "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("c")).as("sc"),
          sum(when(col("c") <= 10, 1L).otherwise(0L)).as("rare"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("sc div n_bigrams").as("mean_bg_count"),
          expr("(rare * 1000000) div n_bigrams").as("rare_micro"))
        .withColumn("keep", col("rare_micro") < 200000)
        .orderBy(col("doc_id"))
    },
    Some("""WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                        FROM documents),
        bg AS (SELECT doc_id,
                 unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                   i -> t[i] || ' ' || t[i+1])) AS g
               FROM tk),
        lm AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY g),
        sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(sum(lm.c) AS BIGINT) AS sc,
                 CAST(sum(CASE WHEN lm.c <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS rare
               FROM bg JOIN lm USING (g) GROUP BY doc_id)
      SELECT doc_id, n_bigrams, sc // n_bigrams AS mean_bg_count,
             (rare * 1000000) // n_bigrams AS rare_micro,
             (rare * 1000000) // n_bigrams < 200000 AS keep
      FROM sc ORDER BY doc_id"""),
    note = "CCNet perplexity-bucket stand-in: corpus bigram LM is " +
      "vocab^2-bounded (broadcast), scoring is one fact pass")

  val all: Seq[GraftQuery] = Seq(q108, q109, q111, q112, q114, q126, q136)
}
