package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
/** Throwaway dev probe for q106 stage timing (staged version). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    val d = "/root/testdata/sf0.1"
    import graft.functions.HashFunctions.shingles
    import graft.functions.TextFunctions.maxElemCount
    val staged = Tables.t(spark, d, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
    val tk = col("tk")
    val base = staged.withColumn("bg",
      transform(sequence(lit(1), size(tk) - 1),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
    val nTok = size(col("tk"))
    val uniq = size(array_distinct(col("tk"))).cast("double") / nTok
    val meanW = (length(col("text")) - nTok + 1).cast("double") / nTok
    val topF = maxElemCount(col("tk")).cast("double") / nTok
    val trigrams = transform(sequence(lit(1), nTok - 2),
      i => concat_ws(" ", element_at(col("bg"), i), element_at(tk, i + 2)))
    val dup3 = lit(1.0) - size(array_distinct(trigrams)).cast("double") / (nTok - 2)
    val top2 = maxElemCount(col("bg")).cast("double") / (nTok - 1)
    val clean = base.filter(nTok >= 20 && uniq >= 0.5 && topF <= 0.2 &&
      meanW.between(3, 6) && dup3 <= 0.6 && top2 <= 0.2)
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val ded = clean.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val evalSh = base.filter(col("doc_id") % 97 === 0)
      .select(explode(shingles(col("tk"))).as("sg")).distinct()
    val contam = ded.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode(shingles(col("tk"))).as("sg"))
      .join(broadcast(evalSh), Seq("sg"))
      .select(col("doc_id")).distinct()
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime(); val n = df.queryExecution.toRdd.count()
      println(f"STAGE $name%-12s ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    time("base")(base)
    time("clean")(clean)
    time("ded")(ded)
    time("evalSh")(evalSh)
    time("contam")(contam)
    spark.stop()
  }
}
