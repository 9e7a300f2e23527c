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
  /** keyed state: the user's OPEN sessions, gap-separated, sorted by start */
  final case class SessList(sessions: Seq[SessState])

  /**
   * Gap-based sessionization with custom keyed state: events of a user
   * more than `gapMinutes` apart belong to different sessions. State holds
   * the user's OPEN sessions as a gap-separated list; each arriving event
   * merges into every session within `gap` of it (bridging two open
   * sessions when it lands between them — possible whenever
   * `watermarkDelay > gap`). A session is emitted ONLY once the event-time
   * watermark passes `last + gap`: no in-watermark event can reach within
   * `gap` of it anymore, so every emitted session is provably final —
   * emitting on gap-proof alone would mis-emit whenever a late bridging
   * event was still admissible. State per user is O(open sessions), which
   * the watermark bounds (closed sessions leave state immediately).
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
      .flatMapGroupsWithState[SessList, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[SessList]) =>
          def out(s: SessState) =
            SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
          var sessions = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val ts = rows.map(_._2.getTime).toArray
          java.util.Arrays.sort(ts)
          for (t <- ts) {
            // merge into every open session within gap of t — a late event
            // can extend one backwards OR bridge two into one; an event
            // farther than gap from all of them opens its own session
            val (near, rest) = sessions.partition(s =>
              t >= s.start - gapMs && t <= s.last + gapMs)
            val merged =
              if (near.isEmpty) SessState(t, t, 1)
              else SessState(math.min(t, near.map(_.start).min),
                math.max(t, near.map(_.last).max), near.map(_.n).sum + 1)
            sessions = (rest :+ merged).sortBy(_.start)
          }
          // ONLY the watermark proves a session final: every in-watermark
          // event t satisfies t >= wm, so once last + gap < wm nothing can
          // merge with (or bridge through) the session anymore. Gap-proof
          // by a newer event is NOT enough while watermarkDelay > gap — a
          // late bridging event may still be admissible.
          val wm = state.getCurrentWatermarkMs
          val (closed, open) = sessions.partition(s => s.last + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessList(open))
            // clamped above the watermark: Spark rejects a timeout at or
            // below it; such sessions emit on the next trigger instead
            state.setTimeoutTimestamp(
              math.max(open.map(_.last).min + gapMs, wm + 1))
          }
          closed.map(out).iterator
      }
  }
}
