package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming transforms over the page/event stream — the Structured
 * Streaming side of the engine's operator surface (the reference has no
 * streaming at all; its incremental loop re-scanned a time window per run,
 * `job/JobUtil.java:543-577`).
 *
 *  - [[windowedCounts]]: watermarked tumbling-window aggregation — the
 *    canonical streaming replacement for the reference's "recon" count
 *    aggregates over a time range.
 *  - [[dedupWithinWatermark]]: streaming exact dedup with bounded state
 *    (duplicates arriving within the watermark horizon are dropped — the
 *    streaming form of `Dedup.exact`).
 *  - [[sessionize]]: gap-based sessions via `flatMapGroupsWithState` with
 *    event-time timeout — custom keyed state with bounded lifetime; state
 *    size is O(open sessions), not O(events).
 */
object StreamOps {

  /** Tumbling-window counts per key, emitted once the watermark closes the
    * window (append mode) — late rows beyond `watermarkDelay` are dropped
    * instead of growing state forever. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDur: String = "10 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n"))

  /** Streaming exact dedup on `keys`: duplicates within the watermark
    * horizon are dropped; state for a key is freed once the watermark
    * passes it (bounded state at any corpus rate). */
  def dedupWithinWatermark(
      df: DataFrame, tsCol: String, keys: Seq[String], delay: String): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)
  /** keyed state — must be public for the state encoder's codegen */
  final case class SessState(start: Long, last: Long, n: Long)

  /**
   * Gap-based sessionization with custom keyed state: events of a user
   * more than `gapMinutes` apart start a new session; a session closes
   * (and is emitted) either when a later event proves the gap or when the
   * event-time watermark passes `last + gap` (timeout), so results are
   * final and state is dropped.
   */
  def sessionize(
      spark: SparkSession,
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .select(col(userCol).cast("long").as("u"), col(tsCol).cast("timestamp").as("t"))
      .withWatermark("t", watermarkDelay)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[SessState]) =>
          def out(s: SessState) =
            SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val closed = state.getOption.map(out)
            state.remove()
            closed.iterator
          } else {
            val ts = rows.map(_._2.getTime).toArray
            java.util.Arrays.sort(ts)
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            for (t <- ts) cur match {
              case Some(s) if t - s.last <= gapMs =>
                // a late cross-batch event inside the watermark can precede
                // the stored session start — extend the session backwards
                cur = Some(SessState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
              case Some(s) =>
                closed += out(s)
                cur = Some(SessState(t, t, 1))
              case None =>
                cur = Some(SessState(t, t, 1))
            }
            for (s <- cur) {
              state.update(s)
              // fire when the watermark proves no event can extend the
              // session — clamped above the current watermark: a late
              // in-watermark event with last + gap <= watermark (possible
              // whenever gap < watermark delay) would otherwise make Spark
              // throw and kill the query; the clamp emits such
              // immediately-final sessions on the next trigger instead
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.iterator
          }
      }
  }
}
