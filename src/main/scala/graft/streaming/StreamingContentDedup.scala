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
        sk.join(corpus.filter(col("cell").isin(touchedCells.map(Int.box): _*))
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
}
