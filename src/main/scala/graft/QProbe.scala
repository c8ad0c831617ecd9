package graft
import org.apache.spark.sql.SparkSession
/** Throwaway dev probe: dump ONE registry query + its oracle for
  * tools/check_oracle.py. Deleted before commit. */
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
    q.fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$qname")
    val sql = q.oracle.map(o => "\"" + qname + "\": " + "\"" +
      o.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\"").getOrElse("")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), s"{$sql}")
    spark.stop()
  }
}
