package graft.pipeline

import graft.functions.TextFunctions._
import graft.functions.expressions.StringRatio.string_ratio
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's offline curation pipeline re-expressed as Spark batch
  * dataflow (SURVEY.md §3.3): raw LLM text → parse (F2) → clean (F1) →
  * validate (F3/F4) → exact dedup (U1 anti-join) → fuzzy dedup (J2 band
  * join, Ratcliff/Obershelp ≥ 0.85 within ±1 year) → enrichment shaping →
  * slug/metadata stamp → last-writer-wins merge (S5/W2).
  *
  * Citations into /root/reference/movie_generator.py: parse :340-386,
  * clean :329-338, year validate :353-356,375-377, exact dedup :201-204,
  * fuzzy dedup :83-94 (threshold 0.85 at :83, ±1-year band at :88),
  * enrichment struct :218-221, slug :384, upsert :452-467.
  *
  * Scale design: the exact-dup check is a hash-partitioned left-anti join;
  * the fuzzy check blocks on a year bucket (floor(year/2)) so the ±1-year
  * band becomes an equi-join component and the expensive string ratio only
  * runs inside buckets — never O(n²) across the corpus (SURVEY O7).
  */
object MoviePipeline {

  /** F2 — parse one raw LLM record blob (TITLE:/YEAR:/DIRECTOR:/CAST:/
    * GENRES:/PLOT: lines) into typed columns. Multiline anchored
    * regexp_extract per field, each value cleaned (F1). */
  def parseRaw(raw: DataFrame, rawCol: String = "raw"): DataFrame = {
    def rawField(name: String) =
      regexp_extract(col(rawCol), s"(?m)^$name:\\s*(.*)$$", 1)
    def field(name: String) = cleanText(rawField(name))
    // per-item clean AFTER the split — the reference cleans each CSV item
    // (movie_generator.py:360-365), so "1. Drama, 2. Comedy" loses both
    // numbered-list prefixes, not just the leading one
    val csvList = (c: org.apache.spark.sql.Column) =>
      filter(transform(split(c, ","), x => cleanText(x)), x => x =!= "")
    raw
      .withColumn("title", field("TITLE"))
      .withColumn("year", extractYear(rawField("YEAR")))
      .withColumn("director", field("DIRECTOR"))
      .withColumn("cast", csvList(rawField("CAST")))
      .withColumn("genres", csvList(rawField("GENRES")))
      .withColumn("plot", field("PLOT"))
  }

  /** Validation guards (movie_generator.py:370-377): reject rows without a
    * usable title; year already clamped by extractYear. */
  def validate(parsed: DataFrame): DataFrame =
    parsed.filter(col("title").isNotNull && col("title") =!= "")

  /** Enrichment shaping + metadata stamp (movie_generator.py:215-221,
    * 379-384): description = plot, structured_enrichment.themes =
    * genres[:3], slug id, processing_status, created_at. */
  def enrich(validated: DataFrame): DataFrame =
    validated
      .withColumn("description", col("plot"))
      .withColumn("structured_enrichment", struct(
        slice(col("genres"), 1, 3).as("themes"),
        concat_ws(" ", lit("themes:"), concat_ws(", ", slice(col("genres"), 1, 3)))
          .as("significance")))
      .withColumn("id", concat_ws("_", slug(col("title")), col("year")))
      .withColumn("processing_status", lit("llm_generated"))
      .withColumn("created_at", current_timestamp())

  /** U1 — exact-key dedup: drop candidates whose (lower(trim(title)), year)
    * already exists in `seen` (movie_generator.py:201-204). Left-anti
    * hash join; `seen` is typically small enough to broadcast (O6). */
  def dedupExact(candidates: DataFrame, seen: DataFrame): DataFrame = {
    val seenKeys = broadcast(
      seen.select(normKey(col("title")).as("k"), col("year")).distinct())
    candidates
      .withColumn("k", normKey(col("title")))
      .join(seenKeys, Seq("k", "year"), "left_anti")
      .drop("k")
  }

  /** J2 — fuzzy band-join dedup: candidate is a dup iff some seen movie has
    * |Δyear| <= 1 AND ratio(titles) >= 0.85 (movie_generator.py:83-94).
    * The ±1 band is rewritten as an equi-join on a generated 2-year bucket
    * (each side also probes the neighbor bucket), turning the O(n²)
    * nested-loop into a shuffled hash join — the SURVEY O7 rewrite. */
  def dedupFuzzy(candidates: DataFrame, seen: DataFrame,
                 threshold: Double = 0.85): DataFrame = {
    // Candidate year y can only match seen years {y-1, y, y+1}, whose
    // 2-year buckets are exactly {floor((y-1)/2), floor((y+1)/2)} (two
    // distinct values). Probing both on the candidate side — seen side
    // keeps its single bucket — makes every ±1 pair meet exactly once.
    val cand = candidates
      .withColumn("ck", normKey(col("title")))
      .withColumnRenamed("year", "c_year")
      .withColumn("bucket", explode(array(
        floor((col("c_year") - 1) / 2), floor((col("c_year") + 1) / 2))))
    val seenB = seen
      .select(normKey(col("title")).as("sk"), col("year").as("s_year"))
      .withColumn("bucket", floor(col("s_year") / 2))
    val dupKeys = cand.join(seenB, Seq("bucket"))
      .filter(abs(col("c_year") - col("s_year")) <= 1)
      .filter(string_ratio(col("ck"), col("sk")) >= threshold)
      .select(col("ck"), col("c_year")).distinct()
    candidates
      .withColumn("ck", normKey(col("title")))
      .withColumnRenamed("year", "c_year")
      .join(dupKeys, Seq("ck", "c_year"), "left_anti")
      .withColumnRenamed("c_year", "year")
      .drop("ck")
  }

  /** S5/W2 — last-writer-wins merge on the business key (title_norm, year)
    * (movie_generator.py:452-467): union old+new, keep the newest row per
    * key by created_at. Batch analog of MERGE; at scale this is one
    * hash-partitioned window over the key. */
  def mergeUpsert(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val unioned = existing.unionByName(incoming, allowMissingColumns = true)
    val w = Window.partitionBy(normKey(col("title")), col("year"))
      .orderBy(col("created_at").desc)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Full batch pipeline: raw blobs + existing corpus → merged corpus. */
  def run(raw: DataFrame, existing: DataFrame): DataFrame = {
    val parsed = enrich(validate(parseRaw(raw)))
    val fresh = dedupFuzzy(dedupExact(parsed, existing), existing)
    mergeUpsert(existing, fresh.drop("raw"))
  }
}
