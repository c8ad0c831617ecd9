package graft.pipeline

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference's running LLM-cost accounting (SURVEY.md §2.4 A7 / §2.9
  * F11: token counts × $/M rates, /root/reference/movie_generator.py:
  * 319-321,415-417,443-444 — $0.15/M input, $0.60/M output, $0.10/M
  * embedding) re-expressed two ways:
  *
  *  - [[costNanos]]: pure-column integer arithmetic (nanodollars — exact,
  *    associative, oracle-checkable; summing doubles would be
  *    order-dependent);
  *  - [[TotalCost]]: a typed `Aggregator` (the §2.10 typed-UDAF surface),
  *    asserted equal to the column form in PipelineSpec.
  *
  * Token estimate: chars/4 rounded up — the standard rough BPE estimate;
  * the reference counts real API tokens, which don't exist offline.
  */
object CostModel {
  val InRateNanosPerTok = 150L    // $0.15 / M tokens
  val OutRateNanosPerTok = 600L   // $0.60 / M tokens
  val EmbedRateNanosPerTok = 100L // $0.10 / M tokens

  /** ceil(chars/4) estimated tokens, as a long column. */
  def estTokens(chars: Column): Column =
    floor((chars + lit(3)) / lit(4)).cast("long")

  def estTokensSql(e: String): String =
    s"CAST(floor(($e + 3) / 4) AS BIGINT)"

  /** Exact per-row pipeline cost in nanodollars: one generation (input),
    * one enrichment (output-rate), one embedding pass over the text. */
  def costNanos(chars: Column): Column =
    estTokens(chars) * lit(InRateNanosPerTok + OutRateNanosPerTok + EmbedRateNanosPerTok)

  def costNanosSql(e: String): String =
    s"${estTokensSql(e)} * ${InRateNanosPerTok + OutRateNanosPerTok + EmbedRateNanosPerTok}"

  /** Typed UDAF: total corpus cost in dollars from per-row char counts. */
  object TotalCost extends Aggregator[Long, Long, Double] {
    override def zero: Long = 0L
    override def reduce(acc: Long, chars: Long): Long =
      acc + ((chars + 3) / 4) * (InRateNanosPerTok + OutRateNanosPerTok + EmbedRateNanosPerTok)
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(acc: Long): Double = acc / 1e9
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
