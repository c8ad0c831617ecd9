package graft.streaming

import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming analogs of the reference's incremental curation
  * loop (SURVEY.md §2.11): checkpointed, stateful, watermarked transforms.
  * These take an unbounded (readStream / MemoryStream) DataFrame with the
  * `events` schema and return the streaming transform; sinks/checkpoints
  * are bound by the caller (tests use the memory sink, production binds
  * `writeStream.option("checkpointLocation", ...)` — the exactly-once
  * replacement for the reference's pickle checkpoint,
  * /root/reference/movie_generator.py:106-168).
  *
  * Every aggregation here carries a watermark: the reference's all-time
  * dedup set (movie_generator.py:58) grows without bound — the watermarked
  * forms are the 100 TB-honest design (SURVEY §7.4).
  */
object StreamingOps {

  /** Watermarked tumbling-window aggregation (batch twin: q40). */
  def tumblingCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Watermarked sliding-window aggregation (batch twin: q41). */
  def slidingCounts(events: DataFrame,
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))

  /** Watermarked session windows per user (batch twin: q42). */
  def sessionize(events: DataFrame,
                 gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Stateful streaming dedup with bounded state (batch twin: q44;
    * the watermarked fix for the reference's unbounded seen-set). */
  def dedupStream(events: DataFrame,
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Custom per-key state via flatMapGroupsWithState (SURVEY §2.11) — the
    * arbitrary-state surface the built-in windows can't express: per user,
    * a running event counter plus a "milestone" record emitted each time
    * the count crosses a multiple of `every`. State is one Long per user
    * (bounded by the key cardinality, not the stream length). */
  def milestones(events: org.apache.spark.sql.Dataset[UserEvent],
                 every: Long = 3): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[Long]) => {
          var count = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer[Milestone]()
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            count += 1
            if (count % every == 0)
              out += Milestone(userId, count, e.event_id)
          }
          state.update(count)
          out.iterator
        })
      .toDF()
  }
}

case class UserEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                     event_type: String, value: Double)
case class Milestone(user_id: Long, milestone: Long, at_event_id: Long)
