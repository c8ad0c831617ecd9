package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump ONE registry query's result + its oracle SQL in the
  * layout tools/check_oracle.py expects — the fast targeted-correctness
  * loop while iterating on a single query (the full Verify run is the
  * gate; this is the inner loop). */
object QProbe {
  def main(args: Array[String]): Unit = {
    val Array(qname, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    val q = QueryRegistry.queries.find(_.name == qname).get
    QueryRegistry.withExecConfs(spark, qname, sfDir) {
      q.fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$qname")
    }
    val sql = q.oracle.map(o => "\"" + qname + "\": " + "\"" +
      o.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\"").getOrElse("")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), s"{$sql}")
    spark.stop()
  }
}
