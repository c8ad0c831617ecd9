package graft

/** Dev tool (r14 optimization round): dump `explain("formatted")` for the
  * named registry queries to plans/r14/<query>_<suffix>.txt — the
  * before/after plan evidence OPTIMIZATION_r14.md cites. Built under the
  * same session confs as Bench (local[32], width 32, per-query exec
  * confs) so the dumped plan is the one the bench actually runs.
  * Usage: sbt "runMain graft.R14Plans before q134_countmin_freq q70_..."
  */
object R14Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", ShmDir.claim("graft-plans"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    val dir = java.nio.file.Paths.get("plans/r14")
    java.nio.file.Files.createDirectories(dir)
    for (n <- names) {
      val txt = QueryRegistry.withExecConfs(spark, n, sfDir) {
        QueryRegistry.byName(n).fn(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
      }
      java.nio.file.Files.writeString(dir.resolve(s"${n}_$suffix.txt"), txt)
      println(s"plans/r14/${n}_$suffix.txt written")
    }
    spark.stop()
  }
}
