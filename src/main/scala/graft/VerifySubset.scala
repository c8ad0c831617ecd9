package graft
import org.apache.spark.sql.SparkSession
/** Dev-only targeted verify: dump a comma-separated list of queries plus
  * their oracle entries, for tools/check_oracle.py over a subset. */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, namesCsv) = args
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    new java.io.File(outDir).mkdirs()
    val qmap = SparkEntry.queries
    names.foreach { name =>
      val df = QueryRegistry.withExecConfs(spark, name, sfDir) {
        qmap(name)(spark, sfDir)
      }
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[subset] dumped $name")
    }
    val oracles = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracles.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
