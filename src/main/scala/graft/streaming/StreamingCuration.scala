package graft.streaming

import graft.pipeline.MoviePipeline
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.hadoop.fs.{FileSystem, Path}

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
  * Scale design — the corpus is parquet PARTITIONED BY a 10-year bucket
  * (`yb`), and a micro-batch rewrites ONLY the buckets its fresh rows land
  * in: dedup reads are partition-pruned to the candidate years ±1, and the
  * merge write is O(touched buckets), not O(corpus). At 100 TB a batch
  * touching 3 buckets rewrites 3 partitions; the rest of the corpus is
  * never read for the write nor modified (asserted byte-identical in
  * StreamingSpec).
  *
  * Crash safety — each touched bucket is swapped atomically with a backup:
  * live bucket dir → `<corpus>_prev_<batchId>/`, staged bucket dir → live.
  * Every window leaves the bucket recoverable: a crash between the two
  * renames is healed by `recoverInterruptedSwap` on the replayed batch
  * (restore the bucket from the backup dir), and a crash after the swap
  * replays idempotently (the re-run batch dedups against the already-merged
  * corpus and rewrites identical content). A plain delete-then-rename — the
  * round-1 shape — had a window where a crash lost the whole corpus.
  * (Delta/Iceberg MERGE would replace this file choreography in a
  * deployment with concurrent readers.)
  */
object StreamingCuration {

  /** Partition granularity: 10 release-years per corpus bucket. */
  val BucketYears = 10

  /** Test-only fault injector: invoked with a 0-based op index immediately
    * BEFORE each filesystem mutation of the swap choreography (mkdirs,
    * renames, cleanup deletes). Tests install a thrower to simulate a crash
    * at an exact point and then assert replay convergence; production
    * leaves the no-op. */
  @volatile private[graft] var swapFault: Int => Unit = _ => ()

  private def bucketOf(year: Column): Column =
    floor(year / BucketYears).cast("long")

  private def corpusFs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Read the current corpus (with its `yb` partition column), or an empty
    * typed frame when the corpus does not exist yet (explicit first-batch
    * bootstrap). Genuine read errors — corrupt footers, IO failures,
    * permissions — PROPAGATE and fail the micro-batch so the checkpoint
    * retries it: swallowing them here would dedup against nothing and make
    * the subsequent merge-write silently drop history. */
  def readCorpus(spark: SparkSession, corpusDir: String): DataFrame =
    if (!corpusFs(spark).exists(new Path(corpusDir)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("title",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("year",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("created_at",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("yb",
            org.apache.spark.sql.types.LongType))))
    else spark.read.parquet(corpusDir)

  /** Heal a swap interrupted by a crash: any bucket sitting in a
    * `<corpus>_prev_*` backup whose live dir is missing is restored, then
    * stale backup/staging dirs are removed (their batch will replay). */
  def recoverInterruptedSwap(spark: SparkSession, corpusDir: String): Unit = {
    val fs = corpusFs(spark)
    val prevDirs = fs.globStatus(new Path(corpusDir + "_prev_*"))
    if (prevDirs != null) prevDirs.foreach { pd =>
      val buckets = fs.listStatus(pd.getPath)
      if (buckets != null) buckets.foreach { b =>
        val live = new Path(corpusDir, b.getPath.getName)
        if (!fs.exists(live)) fs.rename(b.getPath, live)
      }
      fs.delete(pd.getPath, true)
    }
    val staged = fs.globStatus(new Path(corpusDir + "_staging_*"))
    if (staged != null) staged.foreach(s => fs.delete(s.getPath, true))
  }

  /** One micro-batch: parse → partition-pruned dedup vs corpus → merge →
    * per-bucket atomic swap of only the touched partitions. */
  def processBatch(corpusDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    recoverInterruptedSwap(spark, corpusDir)
    val parsed = MoviePipeline.enrich(MoviePipeline.validate(
      MoviePipeline.parseRaw(batch))).drop("raw")

    // Candidate years decide which corpus partitions dedup must see:
    // (normKey, year) exact dups share the year's bucket; fuzzy dups sit
    // within ±1 year, so probe the neighbors' buckets too. This is
    // partition-pruning metadata (a handful of longs), not data, so the
    // driver-side collect is a scalar hop, not a distributed-loop smell.
    val candYears = parsed.select(col("year")).distinct()
      .collect().map(_.getInt(0))
    if (candYears.isEmpty) return
    val dedupBuckets = candYears
      .flatMap(y => Seq(y - 1, y, y + 1))
      .map(y => math.floorDiv(y, BucketYears).toLong).distinct.toSeq

    val corpus = readCorpus(spark, corpusDir)
    val seen = corpus.filter(col("yb").isin(dedupBuckets: _*)) // pruned scan
    val fresh = MoviePipeline.dedupFuzzy(
      MoviePipeline.dedupExact(parsed, seen), seen)
      .select(parsed.columns.map(col): _*)

    // Only buckets that receive fresh rows are rewritten. dedupExact
    // guarantees fresh keys are absent from the corpus, so the merge only
    // APPENDS within a bucket (LWW resolves same-key rows inside the batch);
    // untouched buckets stay byte-identical on disk.
    val touched = fresh.select(bucketOf(col("year")).as("yb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    if (touched.isEmpty) return
    val merged = MoviePipeline.mergeUpsert(
      corpus.filter(col("yb").isin(touched: _*)).drop("yb"), fresh)

    val staging = corpusDir + s"_staging_$batchId"
    merged.withColumn("yb", bucketOf(col("year")))
      .write.partitionBy("yb").mode(SaveMode.Overwrite).parquet(staging)

    val fs = corpusFs(spark)
    val prev = new Path(corpusDir + s"_prev_$batchId")
    var opIdx = 0
    def op(f: => Unit): Unit = { swapFault(opIdx); opIdx += 1; f }
    op(fs.mkdirs(prev))
    op(fs.mkdirs(new Path(corpusDir)))
    // deterministic bucket order so a crash point maps to a fixed op
    touched.sorted.foreach { b =>
      val live = new Path(corpusDir, s"yb=$b")
      if (fs.exists(live)) op(fs.rename(live, new Path(prev, s"yb=$b")))
      op(fs.rename(new Path(staging, s"yb=$b"), live))
    }
    op(fs.delete(prev, true))
    op(fs.delete(new Path(staging), true))
  }

  /** Bind the stream: raw text records in, curated corpus directory out. */
  def start(raw: DataFrame, corpusDir: String, checkpointDir: String): StreamingQuery =
    raw.writeStream
      .foreachBatch(processBatch(corpusDir) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
