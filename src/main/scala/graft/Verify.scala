package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Partition count must track data volume (the r4 scale lesson:
    // 32 partitions x sf1 thrashed TaskMemoryManager): the sf1 pass sets
    // SPARK_GRAFT_SHUFFLE=256. Driver runs at sf0.01 keep the default.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // coalesce(1) keeps the driver-facing layout single-file; the sf1
    // pass opts out (SPARK_GRAFT_COALESCE=0) — a 55M-row single-threaded
    // parquet write would dominate the run. Sorted queries write range-
    // partitioned sorted parts, so a filename-ordered read preserves the
    // global order the compare needs.
    val coalesce1 = sys.env.getOrElse("SPARK_GRAFT_COALESCE", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", ShmDir.claim("graft-verify"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    new java.io.File(outDir).mkdirs()
    // Resume mode for the long sf1 pass (SPARK_GRAFT_SKIP_EXISTING=1):
    // a dump is complete iff Spark's _SUCCESS marker landed, so an
    // interrupted run can be relaunched and only re-does unfinished
    // queries. Driver runs (fresh outDir each time) are unaffected.
    val skipDone = sys.env.get("SPARK_GRAFT_SKIP_EXISTING").contains("1")
    // SPARK_GRAFT_SKIP=q35_...,... : exclude named queries from a dump
    // pass. Exists for the 100x (sf10) pass ONLY: q35's result set is
    // 6.25B rows BY CONTRACT (it is the exact-verify rung behind q34's
    // LSH candidates — quadratic within blocks), so dumping it to
    // parquet is the one thing that cannot scale; its at-scale
    // verification is the in-query sampled-invariant contract
    // (INVARIANTS_sf10.json) instead. Driver runs don't set this.
    val skipNames = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val unknownSkips = skipNames -- SparkEntry.queries.keySet
    require(unknownSkips.isEmpty,
      s"SPARK_GRAFT_SKIP names not in the registry: $unknownSkips")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (skipNames.contains(name))
        System.err.println(s"[verify] $name skipped via SPARK_GRAFT_SKIP")
      else if (skipDone && Files.exists(Paths.get(s"$outDir/$name/_SUCCESS")))
        System.err.println(s"[verify] $name already dumped, skipping")
      else
      try QueryRegistry.withExecConfs(spark, name, sfDir) {
        val df = fn(spark, sfDir)
        (if (coalesce1) df.coalesce(1) else df)
          .write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
