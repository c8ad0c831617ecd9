package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round 9): run EVERY registry query once at a given sf dir and
  * record completion + wall time per query. This is the 100x COMPLETION
  * artifact — Bench's best-of-2 methodology is for comparable timings at
  * the graded sf; at sf10 (2.1 GB parquet, 60M lineitem) the question is
  * "does any of the 150 plans hit a scale-killer (all-pairs blowup, OOM,
  * driver collect of a fact-sized set, runaway shuffle)?", which a single
  * pass answers. Timings are recorded as context (and are box-weather
  * sensitive); failures are explicit, never folded into totals.
  * Usage: `runMain graft.SuiteProbe <sfDir> [outJson]`; optional env
  * SPARK_GRAFT_CPUS (default 32), GRAFT_SHUFFLE_PARTS (default 8x cpus —
  * sf10 shuffles spill at Bench's cpus-sized setting). */
object SuiteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts =
      sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", (cpus.toInt * 8).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", ShmDir.claim("graft-suite"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    def f3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    // Same inter-query hygiene as Bench/Profile: queries leave
    // localCheckpoint blocks cached (never self-unpersisted), and at sf10
    // the accumulated blocks of ~90 earlier queries squeezed q35's
    // blocked sort-join into permanent spill — 35+ min and unfinished vs
    // 105 s in a fresh JVM (first 100x pass). The GC also lets
    // ContextCleaner reclaim shuffle files + broadcasts.
    def dropCached(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    val names = QueryRegistry.queries.map(_.name).sorted
    // q35 is the blocked-quadratic verify rung (6.25B output rows at
    // sf10). Its trailing total-order sort is oracle-presentation
    // machinery (house rule T5): a global range-sort whose sampling pass
    // re-evaluates the whole join and whose shuffle (~150 GB of pair
    // listing at sf10) exceeds the box's storage — no consumer of a
    // verification byproduct requests a sorted 6.25B-row listing. Its
    // completion is measured ORDER-INSENSITIVELY: every pair still flows
    // through the identical join + kernel dataflow, materialized by an
    // aggregate (count + conjunction of the jacc_xck contract column,
    // which must hold or the cell records contract=0) instead of by the
    // listing sort. The cell is marked so a reader can tell.
    val orderInsensitive = Set("q35_ngram_jaccard_blocked")
    var failed = 0
    val rows = names.map { n =>
      val t0 = System.nanoTime()
      val cell = try {
        val c = if (orderInsensitive(n)) {
          val df = QueryRegistry.byName(n).fn(spark, sfDir)
          val boolCols = df.schema.fields
            .filter(_.dataType == org.apache.spark.sql.types.BooleanType)
            .map(_.name).toSeq
          val r = QueryRegistry.withExecConfs(spark, n) {
            df.agg(org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("n"),
              boolCols.map(b => org.apache.spark.sql.functions.min(
                org.apache.spark.sql.functions.when(
                  org.apache.spark.sql.functions.col(b), 1L)
                  .otherwise(0L)).as(b)): _*).head()
          }
          require(boolCols.forall(b => r.getAs[Long](b) == 1L),
            s"$n invariant contract violated: " +
              boolCols.map(b => s"$b=${r.getAs[Long](b)}").mkString(","))
          r.getAs[Long]("n")
        } else QueryRegistry.withExecConfs(spark, n) {
          QueryRegistry.byName(n).fn(spark, sfDir).queryExecution.toRdd.count()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        dropCached()
        val mark = if (orderInsensitive(n)) ""","order_insensitive":true""" else ""
        s"""{"rows":$c,"secs":${f3(secs)}$mark}"""
      } catch { case e: Throwable =>
        failed += 1
        dropCached()
        val msg = String.valueOf(e).replace("\\", "\\\\")
          .replace("\"", "\\\"").replaceAll("[\\r\\n\\t]", " ").take(200)
        s"""{"error":"$msg"}"""
      }
      // one line per query so a log tail shows live progress
      println(s"SUITE $n $cell")
      s""""$n":$cell"""
    }
    val total = rows.mkString(",")
    val line = s"""{"metric":"suite_completion","sf_dir":"$sfDir",""" +
      s""""cpus":$cpus,"shuffle_partitions":$shuffleParts,""" +
      s""""queries":${names.size},"failed":$failed,"per_query":{$total}}"""
    println(s"SUITEJSON $line")
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
