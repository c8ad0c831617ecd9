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
  * the writing batch id. A batch's dedup read EXCLUDES its own partition
  * and its write dynamically overwrites exactly that partition, so a
  * replayed batch (crash after a partial or complete write) recomputes the
  * same fresh set against the same prior corpus and rewrites its partition
  * in place — idempotent with no swap choreography, because the store is
  * append-only by construction (batch partitions never overlap).
  *
  * Scale shape: the probe is an equi-join on (band, bkey) — at 100 TB the
  * sketch store is bucketed by band key so the probe shuffles only the
  * (small) batch side; the jaccard verify touches candidate pairs only,
  * never the corpus. Documents with fewer than ShingleN tokens have no
  * shingles, hence no bands, and are always admitted (documented q34
  * semantics: sketch dedup is for prose, not fragments).
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

    // candidates vs the prior corpus (own partition excluded — replay safety)
    val corpusDups = readStore(spark, s"$storeDir/sketches", batchId) match {
      case None => spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
      case Some(corpus) =>
        sk.join(corpus.select(col("band"), col("bkey"),
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
    // dynamic partition overwrite: only this batch's partition is replaced;
    // an all-dup batch writes nothing and leaves the store untouched
    for ((df, sub) <- Seq((freshSk, "sketches"), (freshDocs, "docs")))
      df.write.partitionBy("batch")
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
