package graft.streaming

import graft.pipeline.MoviePipeline
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's incremental curation loop (SURVEY.md §3.3,
  * /root/reference/movie_generator.py:469-539) as a Structured Streaming
  * `foreachBatch` job: each micro-batch of raw LLM-record text is parsed,
  * validated, deduplicated against the CURRENT corpus (exact anti-join +
  * fuzzy band join — the per-batch corpus read is the streaming analog of
  * the reference's seen-set refresh every 50 records, :510-511), merged
  * last-writer-wins, and written back.
  *
  * Checkpointing: `checkpointLocation` gives exactly-once micro-batch
  * bookkeeping — the replacement for the reference's pickle checkpoint
  * (:106-168); a restarted query resumes from the last committed batch.
  *
  * State store: a plain parquet directory (overwritten per batch via a
  * staging swap — Delta/Iceberg MERGE would replace this in a deployment
  * with concurrent readers).
  */
object StreamingCuration {

  /** Read the current corpus, or an empty typed frame on first batch. */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    try spark.read.parquet(corpusDir)
    catch {
      case _: Exception =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("title",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("year",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("created_at",
              org.apache.spark.sql.types.TimestampType))))
    }

  /** One micro-batch: parse → dedup vs corpus → merge → swap-write. */
  def processBatch(corpusDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val corpus = readCorpus(spark, corpusDir)
    val parsed = MoviePipeline.enrich(MoviePipeline.validate(
      MoviePipeline.parseRaw(batch))).drop("raw")
    val fresh = MoviePipeline.dedupFuzzy(
      MoviePipeline.dedupExact(parsed, corpus), corpus)
    val merged = MoviePipeline.mergeUpsert(
      corpus, fresh.select(parsed.columns.map(col): _*))
    // swap-write: stage then move, so a crash mid-write never truncates
    // the corpus (micro-batch replays are idempotent via the merge key)
    val staging = corpusDir + s"_staging_$batchId"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(corpusDir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
  }

  /** Bind the stream: raw text records in, curated corpus directory out. */
  def start(raw: DataFrame, corpusDir: String, checkpointDir: String): StreamingQuery =
    raw.writeStream
      .foreachBatch(processBatch(corpusDir) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
