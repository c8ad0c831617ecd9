package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming small-file compaction — the maintenance job that makes
  * q152's bin-packing plan OPERATIONAL inside a streaming ingest (the
  * public Delta/Iceberg "OPTIMIZE as a background job" pattern,
  * completing VERDICT r7 #6: plan → audit → MATERIALIZED → now run as
  * part of the pipeline that creates the problem).
  *
  * Table layout (manifest-pointer commit, the public Iceberg discipline —
  * the COMMIT is one atomic rename of a pointer file, never a multi-dir
  * swap):
  *
  * {{{
  *   tableDir/
  *     _CURRENT              # "v=<n>;upTo=<batchId>" — THE commit point
  *     v<n>/bin=<b>/part...  # compacted base: one file per packed bin
  *     live/batch=<id>/      # one small file per micro-batch since upTo
  * }}}
  *
  * - INGEST: each micro-batch overwrites `live/batch=<id>` (idempotent
  *   under replay — the foreachBatch id is stable across restarts).
  * - READ ([[snapshot]]): current base + live batches with id > upTo.
  *   Stale dirs (consumed live batches, old base versions, orphaned
  *   staging) are EXCLUDED by the pointer, so cleanup is best-effort.
  * - COMPACT: when the live count reaches `maxLive`, plan bins over the
  *   ACTUAL on-disk file sizes (greedy sorted next-fit — the q152
  *   dataflow, here over a manifest-sized inventory on the driver).
  *   Files already >= target carry into `v<n+1>` as their own bins via
  *   hard links (no re-encode — write amplification stays O(live tail),
  *   not O(table)); only the under-filled tail + live files are
  *   repacked in ONE job (each bin its own sub-scan stamped with a
  *   literal bin id, repartition(bin) + partitionBy(bin) → exactly one
  *   file per bin). Commit is `_CURRENT` via temp-file + atomic rename;
  *   the pointer payload is CRC-sealed.
  *
  * Crash safety by construction: before the pointer rename the old
  * snapshot is intact (a half-written v<n+1> is orphaned and
  * overwritten on the replayed attempt); after it the new snapshot is
  * complete and consumed live dirs are ignored. [[compactionFault]]
  * injects crashes at each step for the test matrix (the
  * StreamingCuration discipline).
  */
object StreamingCompaction {

  /** Test hook: invoked with an op index at each crash point
    * (0 = after staging write, before pointer commit; 1 = after pointer
    * commit, before cleanup). Production leaves it a no-op. */
  @volatile private[graft] var compactionFault: Int => Unit = _ => ()

  private case class TableState(version: Long, upTo: Long)

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def crc32(s: String): String = {
    val c = new java.util.zip.CRC32()
    c.update(s.getBytes("UTF-8"))
    java.lang.Long.toHexString(c.getValue)
  }

  private def statePayload(st: TableState): String = {
    val body = s"v=${st.version};upTo=${st.upTo}"
    s"$body;crc=${crc32(body)}"
  }

  /** Pointer payloads are CRC-sealed (ADVICE r8): the tmp write-ahead is
    * trusted on version ties, so a torn-but-still-parseable truncation
    * (e.g. `v=2;upTo=1` cut from `v=2;upTo=12`) must read as ABSENT,
    * not commit a wrong upTo and resurface consumed live batches.
    *
    * The seal is REQUIRED only where torn writes can occur — the tmp
    * write-ahead. The main `_CURRENT` is only ever replaced by an atomic
    * rename, cannot be torn, and may predate the seal (a table committed
    * by the pre-crc writer): demanding a seal there would silently parse
    * a healthy pointer as absent, reset the table to v0, and let the
    * next compact+sweep destroy the old base. An unsealed main pointer
    * therefore still parses; a sealed one validates. */
  private def parseState(txt: String, requireSeal: Boolean): TableState = {
    val t = txt.trim
    val cut = t.lastIndexOf(";crc=")
    require(cut > 0 || !requireSeal,
      s"pointer payload missing required crc seal: '$t'")
    val body =
      if (cut < 0) t
      else {
        val (b, crc) = (t.substring(0, cut), t.substring(cut + 5))
        require(crc32(b) == crc, s"pointer payload crc mismatch: '$t'")
        b
      }
    val kv = body.split(";").map(_.split("=", 2))
      .map(a => a(0) -> a(1)).toMap
    TableState(kv("v").toLong, kv("upTo").toLong)
  }

  private def readState(spark: SparkSession, tableDir: String): TableState = {
    val f = fs(spark)
    // a crash between create and the completed write leaves a torn tmp —
    // unparseable content OR an unreadable file (checksum sidecar
    // mismatch) must read as ABSENT, not brick every subsequent
    // readState (the _CURRENT itself is only ever replaced atomically,
    // so a torn main pointer cannot occur)
    def read(p: Path, requireSeal: Boolean): Option[TableState] = scala.util.Try {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](256)
        var n = in.read(b)
        while (n > 0) { buf.write(b, 0, n); n = in.read(b) }
        parseState(new String(buf.toByteArray, "UTF-8"), requireSeal)
      } finally in.close()
    }.toOption
    // the durably-written tmp is the commit's write-ahead: if a crash
    // landed between tmp write and the atomic move, the newer of the
    // two states wins (tmp.version is always current or current+1).
    // Only the tmp demands the crc seal — it is the one file a crash
    // can tear; the main pointer is rename-atomic (see parseState).
    (read(new Path(s"$tableDir/_CURRENT"), requireSeal = false) ++
      read(new Path(s"$tableDir/_CURRENT.tmp"), requireSeal = true))
      .reduceOption((a, b) => if (a.version >= b.version) a else b)
      .getOrElse(TableState(0L, -1L))
  }

  private def commitState(spark: SparkSession, tableDir: String,
                          st: TableState): Unit = {
    val f = fs(spark)
    val tmp = new Path(s"$tableDir/_CURRENT.tmp")
    val out = f.create(tmp, true)
    out.write(statePayload(st).getBytes("UTF-8"))
    out.hsync(); out.close()
    // atomic replace on a local/posix fs; readState's tmp fallback covers
    // a crash in any window around it (tmp is the write-ahead record)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(tmp.toUri.getPath),
      java.nio.file.Paths.get(s"$tableDir/_CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def liveBatchDirs(spark: SparkSession, tableDir: String,
                            after: Long): Seq[(Long, Path)] = {
    val f = fs(spark)
    val live = new Path(s"$tableDir/live")
    if (!f.exists(live)) Nil
    else f.listStatus(live).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(s => s.getPath.getName.stripPrefix("batch=").toLong -> s.getPath)
      .filter(_._1 > after)
      .sortBy(_._1)
  }

  /** Data files (path, bytes) of the current base + the given live dirs —
    * the manifest-sized inventory the packing plans over. */
  private def inventory(spark: SparkSession, tableDir: String,
                        st: TableState,
                        live: Seq[(Long, Path)]): Seq[(Path, Long)] = {
    val f = fs(spark)
    val roots = (if (st.version > 0) Seq(new Path(s"$tableDir/v${st.version}"))
                 else Nil) ++ live.map(_._2)
    roots.flatMap { r =>
      val it = f.listFiles(r, true)
      val buf = scala.collection.mutable.ArrayBuffer[(Path, Long)]()
      while (it.hasNext) {
        val s = it.next()
        val n = s.getPath.getName
        if (s.isFile && !n.startsWith("_") && !n.startsWith("."))
          buf += (s.getPath -> s.getLen)
      }
      buf.toSeq
    }
  }

  /** Greedy sorted next-fit over actual byte sizes (q152's packing, on
    * the driver over the manifest): bytes DESC, path tiebreak;
    * bin = exclusive running total div target. Returns bin → its files. */
  private def planBins(files: Seq[(Path, Long)],
                       target: Long): Map[Long, Seq[Path]] = {
    var prior = 0L
    files.sortBy { case (p, b) => (-b, p.toString) }.map { case (p, b) =>
      val bin = prior / target; prior += b
      bin -> p
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  /** Rewrite base ∪ live(≤ upToNew) into `v<n+1>` and commit.
    *
    * Write amplification is bounded by the UNDER-TARGET tail (ADVICE
    * r8): files already at or above the bin target — bins packed by a
    * previous cycle, or an oversized live batch — are NOT re-encoded.
    * Each is carried into `v<n+1>` as its own bin via a hard link
    * (zero-copy, and crash-safe: the old version's file is untouched, a
    * pre-commit crash orphans only the new links). Only the under-filled
    * tail plus the small live files pay the parquet rewrite, so a
    * steady-state cycle costs O(maxLive batches + one partial bin), not
    * O(table). On an object store without link support the same
    * carry-forward is a manifest reference (the Iceberg pattern); the
    * local-fs stand-in uses links to keep every version dir
    * self-contained — which is what lets [[sweepStale]] stay a plain
    * directory delete. */
  private[graft] def compact(spark: SparkSession, tableDir: String,
                             target: Long, upToNew: Long): Unit = {
    val st = readState(spark, tableDir)
    val consumed = liveBatchDirs(spark, tableDir, st.upTo)
      .filter(_._1 <= upToNew)
    val files = inventory(spark, tableDir, st, consumed)
    if (files.isEmpty) return
    val (full, small) = files.partition(_._2 >= target)
    val bins = planBins(small, target)
    val next = st.version + 1
    val outDir = s"$tableDir/v$next"
    // bin membership by CONSTRUCTION, not by path-string matching: each
    // bin's file group is its own sub-scan stamped with a literal bin id
    // (a join on input_file_name is a string-parity trap — URI encoding
    // differs between the driver's Path and the executor's file name).
    // Plan width is O(bins) scans — manifest-bounded, and each sub-scan
    // opens only its own files.
    if (bins.nonEmpty)
      bins.toSeq.sortBy(_._1)
        .map { case (bin, paths) =>
          spark.read.parquet(paths.map(_.toString): _*)
            .withColumn("bin", lit(bin))
        }
        .reduce(_.unionByName(_))
        .repartition(col("bin"))
        .write.mode("overwrite").partitionBy("bin")
        .parquet(outDir)
    else { // everything is already full-sized; still need a fresh v dir
      fs(spark).delete(new Path(outDir), true)
      fs(spark).mkdirs(new Path(outDir))
    }
    // carry full bins forward AFTER the spark write (overwrite mode
    // would wipe links created first); one bin per carried file, ids
    // above the packed range
    val fullStart = if (bins.isEmpty) 0L else bins.keys.max + 1L
    full.sortBy { case (p, b) => (-b, p.toString) }.zipWithIndex
      .foreach { case ((p, _), i) =>
        val binDir = java.nio.file.Paths.get(outDir, s"bin=${fullStart + i}")
        java.nio.file.Files.createDirectories(binDir)
        val dst = binDir.resolve(p.getName)
        java.nio.file.Files.deleteIfExists(dst) // replayed attempt
        try java.nio.file.Files.createLink(
          dst, java.nio.file.Paths.get(p.toUri.getPath))
        catch {
          // no-link filesystems surface FileSystemException (an
          // IOException), not just UOE — degrade to a byte copy either
          // way (still no parquet re-encode)
          case _: UnsupportedOperationException | _: java.io.IOException =>
            java.nio.file.Files.copy(
              java.nio.file.Paths.get(p.toUri.getPath), dst)
        }
      }
    compactionFault(0) // crash BEFORE the commit: old snapshot intact
    commitState(spark, tableDir, TableState(next, upToNew))
    compactionFault(1) // crash AFTER the commit: cleanup is best-effort
    sweepStale(spark, tableDir)
  }

  /** Delete everything the pointer excludes: old version dirs, consumed
    * live batches. Pure garbage collection — a crash that skips it (or
    * a prior crash that left debris) is repaired by the NEXT sweep, and
    * reads never see the stale dirs either way. */
  private def sweepStale(spark: SparkSession, tableDir: String): Unit = {
    val st = readState(spark, tableDir)
    val f = fs(spark)
    val root = new Path(tableDir)
    if (f.exists(root)) f.listStatus(root).foreach { s =>
      val n = s.getPath.getName
      if (s.isDirectory && n.startsWith("v") &&
          n.stripPrefix("v").forall(_.isDigit) &&
          n.stripPrefix("v").toLong != st.version)
        f.delete(s.getPath, true)
    }
    val live = new Path(s"$tableDir/live")
    if (f.exists(live)) f.listStatus(live).foreach { s =>
      val n = s.getPath.getName
      if (s.isDirectory && n.startsWith("batch=") &&
          n.stripPrefix("batch=").toLong <= st.upTo)
        f.delete(s.getPath, true)
    }
  }

  /** One micro-batch of the ingest+maintain loop (exposed for replay
    * tests): idempotent append, then compaction when the live tail
    * reaches `maxLive` batches. */
  def processBatch(tableDir: String, target: Long, maxLive: Int)
                  (df: DataFrame, id: Long): Unit = {
    val spark = df.sparkSession
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"$tableDir/live/batch=$id")
    val st = readState(spark, tableDir)
    if (liveBatchDirs(spark, tableDir, st.upTo).count(_._1 <= id) >= maxLive)
      compact(spark, tableDir, target, id)
  }

  /** The committed table view: compacted base + unconsumed live tail.
    * Everything else on disk (orphaned staging, consumed batches, old
    * versions) is invisible — that is what the pointer buys. */
  def snapshot(spark: SparkSession, tableDir: String): DataFrame = {
    val st = readState(spark, tableDir)
    val roots =
      (if (st.version > 0) Seq(s"$tableDir/v${st.version}") else Nil) ++
        liveBatchDirs(spark, tableDir, st.upTo).map(_._2.toString)
    if (roots.isEmpty)
      throw new IllegalStateException(s"empty table at $tableDir")
    // base carries the bin partition column; live batches do not
    roots.map(r => spark.read.parquet(r).drop("bin"))
      .reduce(_.unionByName(_))
  }

  /** Streaming entry: ingest `rows` with one small file per micro-batch,
    * compacting every `maxLive` batches. availableNow semantics like
    * StreamingCuration.start. */
  def start(rows: DataFrame, tableDir: String, checkpointDir: String,
            target: Long = 1L << 20, maxLive: Int = 4): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((df: DataFrame, id: Long) =>
        processBatch(tableDir, target, maxLive)(df, id))
      .start()
}
