package graft.streaming

import graft.functions.HashFunctions._
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Streaming CONTENT near-dup dedup — the MinHash+LSH batch pipeline (q34)
  * as an incremental `foreachBatch` stage: each micro-batch of documents is
  * sketched (packed 62-bit shingle hashes + LSH band keys), probed against
  * the corpus sketch store on the band key, jaccard-verified, and only
  * never-seen-before documents are admitted. The streaming complement of
  * StreamingCuration's title/year dedup: that one dedups on metadata, this
  * one on content sketches.
  *
  * Store layout (`<dir>/sketches`, `<dir>/docs`): parquet PARTITIONED BY
  * the writing batch id — and the sketch store additionally by the LSH
  * `cell` (BandIndexStore.cellOf: band × bkey-sub-bucket, 32 values). A
  * batch's dedup read EXCLUDES its own partition and its write
  * dynamically overwrites exactly its partitions, so a replayed batch
  * (crash after a partial or complete write) recomputes the same fresh
  * set against the same prior corpus and rewrites its partitions in
  * place — idempotent with no swap choreography, because the store is
  * append-only by construction (batch partitions never overlap; a replay
  * is deterministic, so it covers exactly the cells a partial write
  * touched).
  *
  * Scale shape: the probe is an equi-join on (band, bkey), and the
  * corpus side is PARTITION-PRUNED to the cells the batch actually
  * touches before any task launches (the batch's cell list is bounded by
  * the 32-value cell domain — a driver-side constant, same mechanics as
  * BandIndexStore.probe): sketches of prior docs in untouched cells are
  * never read, so per-batch probe IO scales with the batch's cell
  * footprint, not the corpus. The jaccard verify touches candidate pairs
  * only, never the corpus. Documents with fewer than ShingleN tokens
  * have no shingles, hence no bands, and are always admitted (documented
  * q34 semantics: sketch dedup is for prose, not fragments).
  */
object StreamingContentDedup {

  /** Jaccard threshold over packed shingle-hash sets. */
  val Threshold = 0.7

  private def fsOf(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Sketch a (doc_id, text) frame: packed hashes + exploded band keys. */
  private def sketched(df: DataFrame): DataFrame = {
    val hs = packedHashes(shingles(tokens(col("text"))))
    val base = df.select(col("doc_id"), col("text"), hs.as("hs"))
    val mhCols = (0 until NumHashes).map(k => minHashPacked(col("hs"), k).as(s"mh$k"))
    val mh = base.select(col("doc_id") +: col("hs") +: mhCols: _*)
    val bandStructs = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        bandKey((0 until NumHashes).map(k => col(s"mh$k")), b).as("bkey"))
    }
    mh.select(col("doc_id"), col("hs"),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("hs"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .withColumn("cell",
        graft.operators.BandIndexStore.cellOf(col("band"), col("bkey")))
  }

  private def readStore(spark: SparkSession, dir: String,
                        excludeBatch: Long): Option[DataFrame] = {
    if (!fsOf(spark).exists(new Path(dir))) None
    else Some(spark.read.parquet(dir).filter(col("batch") =!= excludeBatch))
  }

  /** Cell-prune `corpus` when its layout carries the `cell` partition
    * column; a store written by the pre-r6 layout (partitioned by batch
    * only) has no such column and must fall back to the unpruned probe
    * instead of throwing AnalysisException on the first resumed batch
    * (ADVICE r6). New writes still land batch=N/cell=C, so an upgraded
    * store becomes prunable as soon as it is rebuilt. */
  private def cellPruned(corpus: DataFrame, cells: Seq[Int]): DataFrame =
    if (corpus.columns.contains("cell"))
      corpus.filter(col("cell").isin(cells.map(Int.box): _*))
    else corpus

  /** One micro-batch: sketch → LSH probe vs prior corpus → jaccard verify →
    * within-batch dedup → idempotent partition write. */
  def processBatch(storeDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val sk = sketched(batch).localCheckpoint()
    val jac = round(
      size(array_intersect(col("a_hs"), col("b_hs"))).cast("double") /
        size(array_union(col("a_hs"), col("b_hs"))), 6)

    // candidates vs the prior corpus (own partition excluded — replay
    // safety), partition-pruned to the batch's touched cells: the cell
    // list is bounded by the 32-value domain, inlined as literals so the
    // prune happens before task launch (BandIndexStore.probe mechanics)
    val touchedCells = sk.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val corpusDups = readStore(spark, s"$storeDir/sketches", batchId) match {
      case None => spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
      case Some(corpus) =>
        sk.join(cellPruned(corpus, touchedCells.toIndexedSeq)
            .select(col("band"), col("bkey"),
            col("hs").as("b_hs")), Seq("band", "bkey"))
          .select(col("doc_id"), col("hs").as("a_hs"), col("b_hs"))
          .distinct()
          .filter(jac >= Threshold)
          .select(col("doc_id")).distinct()
    }
    // within-batch dedup: the smallest doc_id of a near-dup pair survives
    val batchDups = sk.as("x")
      .join(sk.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("x.hs").as("a_hs"),
        col("y.hs").as("b_hs"))
      .distinct()
      .filter(jac >= Threshold)
      .select(col("doc_id")).distinct()

    val freshIds = sk.select(col("doc_id")).distinct()
      .join(corpusDups, Seq("doc_id"), "left_anti")
      .join(batchDups, Seq("doc_id"), "left_anti")

    val freshSk = sk.join(freshIds, Seq("doc_id"))
      .withColumn("batch", lit(batchId))
    val freshDocs = batch.join(freshIds, Seq("doc_id"))
      .withColumn("batch", lit(batchId))
    // dynamic partition overwrite: only this batch's partitions are
    // replaced; an all-dup batch writes nothing and leaves the store
    // untouched. Sketches nest cell under batch so future batches' probes
    // prune on it (batch=N/cell=C directories).
    for ((df, sub, parts) <- Seq(
        (freshSk, "sketches", Seq("batch", "cell")),
        (freshDocs, "docs", Seq("batch"))))
      df.write.partitionBy(parts: _*)
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite).parquet(s"$storeDir/$sub")
    sk.unpersist()
  }

  /** Bind the stream: (doc_id, text) records in, dedup store out. */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .foreachBatch(processBatch(storeDir) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** INDEXED ingest — q125's incremental-near-dup contract as a stream
    * over a persistent [[graft.operators.BandIndexStore]]-layout index
    * (VERDICT r6 "Next round" #6: the streaming dedup and the persisted
    * band index were two solutions to one problem; this is the pinned
    * integration). Each micro-batch is sketched, PROBED against the index
    * (band equi-join cell-pruned to the batch's touched cells; signature
    * reads pruned to the candidates' hash cells — BandIndexStore.probe
    * mechanics over the same two-table layout), its q125-shaped verdicts
    * (doc_id, dup_of = min prior doc with jaccard >= threshold, jaccard)
    * are written per batch, and then the WHOLE batch folds into the index
    * — flag-don't-drop semantics, exactly q125's corpus growth, so batch
    * N's verdicts equal q125 run with corpus = batches 0..N-1.
    *
    * Layout under `indexDir`: `bands` (doc_id, band, bkey) partitioned by
    * (batch, cell); `sigs` ONE row per doc (doc_id, hs) partitioned by
    * (batch, cell = sigCellOf(doc_id)); `verdicts` partitioned by batch.
    * All three writes are dynamic-partition-overwrite of the batch's own
    * deterministic partitions and every read excludes the writing batch,
    * so a crash-replayed batch recomputes identical verdicts against the
    * same prior index and rewrites its partitions in place — idempotent,
    * same replay story as the sketch store above. */
  def processBatchIndexed(indexDir: String, threshold: Double = 0.5)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.operators.BandIndexStore.{cellOf, sigCellOf}
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val sk = sketched(batch).localCheckpoint()
    val newBands = sk.select(col("doc_id").as("new_id"), col("band"),
      col("bkey"), col("cell"))
    val touched = newBands.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    val verdicts = readStore(spark, s"$indexDir/bands", batchId) match {
      case None =>
        batch.select(col("doc_id"), lit(-1L).as("dup_of"), lit(0.0).as("jaccard"))
      case Some(bands) =>
        val cand = newBands
          .join(cellPruned(bands, touched)
              .select(col("doc_id").as("old_id"), col("band"), col("bkey")),
            Seq("band", "bkey"))
          .select(col("new_id"), col("old_id")).distinct()
          .localCheckpoint()
        val sigCells = cand.select(sigCellOf(col("old_id")).as("cell"))
          .distinct().collect().map(_.getInt(0)).sorted.toIndexedSeq
        val so = readStore(spark, s"$indexDir/sigs", batchId)
          .map(cellPruned(_, sigCells))
          .getOrElse(spark.emptyDataFrame
            .select(lit(0L).as("doc_id"), lit(Array.empty[Long]).as("hs")).limit(0))
          .select(col("doc_id").as("old_id"), col("hs").as("hso"))
        val sn = sk.select(col("doc_id").as("new_id"), col("hs").as("hsn"))
          .dropDuplicates("new_id")
        val matches = cand.join(sn, "new_id").join(so, "old_id")
          .select(col("new_id"), col("old_id"),
            round(size(array_intersect(col("hsn"), col("hso"))).cast("double") /
              size(array_union(col("hsn"), col("hso"))), 6).as("jaccard"))
          .filter(col("jaccard") >= threshold)
        val bestIds = matches.groupBy(col("new_id"))
          .agg(min(col("old_id")).as("dup_of"))
          .withColumnRenamed("new_id", "bn")
        val best = bestIds.join(matches,
            bestIds("bn") === matches("new_id") &&
              bestIds("dup_of") === matches("old_id"))
          .select(col("bn").as("new_id"), col("dup_of"), col("jaccard"))
        batch.select(col("doc_id"))
          .join(best, col("doc_id") === best("new_id"), "left")
          .select(col("doc_id"),
            coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
            coalesce(col("jaccard"), lit(0.0)).as("jaccard"))
    }
    val outBands = sk.select(col("doc_id"), col("band"), col("bkey"), col("cell"))
      .withColumn("batch", lit(batchId))
    val outSigs = sk.select(col("doc_id"), col("hs")).dropDuplicates("doc_id")
      .withColumn("cell", sigCellOf(col("doc_id")))
      .withColumn("batch", lit(batchId))
    val outVerdicts = verdicts.withColumn("batch", lit(batchId))
    for ((df, sub, parts) <- Seq(
        (outBands, "bands", Seq("batch", "cell")),
        (outSigs, "sigs", Seq("batch", "cell")),
        (outVerdicts, "verdicts", Seq("batch"))))
      df.write.partitionBy(parts: _*)
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite).parquet(s"$indexDir/$sub")
    sk.unpersist()
  }

  /** Bind the indexed-ingest stream (q125 verdicts + growing band index). */
  def startIndexed(docs: DataFrame, indexDir: String, checkpointDir: String,
                   threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .foreachBatch(processBatchIndexed(indexDir, threshold) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
