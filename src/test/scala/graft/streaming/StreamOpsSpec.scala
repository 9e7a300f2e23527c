package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Watermarked windows, streaming dedup, and stateful sessionization over
  * MemoryStream sources — one continuous query per test; the watermark
  * advances from each processed batch's max event time (plus Spark's
  * no-data flush batches, which fire timeouts and close windows). */
class StreamOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1735689600000L + min * 60000L)

  test("watermarked tumbling windows emit finalized counts, drop late data") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val counts = StreamOps.windowedCounts(
      in.toDF.toDF("ts", "k"), "ts", "k", windowDur = "10 minutes", watermarkDelay = "5 minutes")
    val q = counts.writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      in.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"), (ts(12), "a"))
      q.processAllAvailable()
      // watermark 12-5=7 < 10 → window [0,10) still open
      in.addData((ts(31), "a")) // pushes watermark to 26 → closes [0,10) and [10,20)
      q.processAllAvailable()
      val rows = spark.table("wc").select("k", "n").as[(String, Long)].collect().toSet
      assert(rows.contains(("a", 2L)), s"window[0,10) a-count finalized: $rows")
      assert(rows.contains(("b", 1L)), s"window[0,10) b-count finalized: $rows")
      // a LATE arrival for the closed window is dropped, not re-emitted
      in.addData((ts(4), "a"), (ts(60), "z"))
      q.processAllAvailable()
      assert(spark.table("wc").filter(col("k") === "a" && col("n") === 3).count() === 0,
        "late row past the watermark must not reopen the window")
    } finally q.stop()
  }

  test("streaming dedup within watermark drops duplicate keys") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamOps.dedupWithinWatermark(
      in.toDF.toDF("ts", "doc_id", "text"), "ts", Seq("doc_id"), "30 minutes")
    val q = deduped.writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      in.addData((ts(1), 1L, "x"), (ts(2), 1L, "x-dup"), (ts(3), 2L, "y"))
      q.processAllAvailable()
      in.addData((ts(5), 2L, "y-dup"), (ts(6), 3L, "z")) // cross-batch dup on key 2
      q.processAllAvailable()
      val ids = spark.table("dd").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L), "one survivor per key across batches")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions by gap and by timeout") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    // 5-minute delay: the backward-extension case feeds an event 1 minute
    // late, which must land INSIDE the watermark to be accepted at all
    val sessions = StreamOps.sessionize(
      spark, in.toDF.toDF("user_id", "ts"), gapMinutes = 30, watermarkDelay = "5 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 7: events at 0,10,20 (one session), then 100 — the 100-min
      // event itself proves the >30-min gap and closes session one
      in.addData((7L, ts(0)), (7L, ts(10)), (7L, ts(20)))
      q.processAllAvailable()
      in.addData((7L, ts(100)))
      q.processAllAvailable()
      val closedByGap = spark.table("sess").as[StreamOps.SessionOut].collect()
      assert(closedByGap.exists(s => s.user_id == 7 && s.n_events == 3 &&
        s.session_start == ts(0) && s.session_end == ts(20)),
        s"gap event must close the first session: ${closedByGap.toSeq}")

      // late cross-batch event WITHIN the watermark extends a session
      // backwards: user 11 at minute 150, then minute 149 arrives in the
      // next batch (watermark is 99 after the ts(100) batch)
      in.addData((11L, ts(150)))
      q.processAllAvailable()
      in.addData((11L, ts(149)))
      q.processAllAvailable()

      // timeout path: other-user events push the watermark past last+gap
      // with nothing new for users 7/11 → open sessions close via timeout
      in.addData((9L, ts(200)))
      q.processAllAvailable()
      in.addData((9L, ts(201)))
      q.processAllAvailable()
      val all = spark.table("sess").as[StreamOps.SessionOut].collect()
      assert(all.exists(s => s.user_id == 7 && s.n_events == 1 && s.session_start == ts(100)),
        s"watermark timeout must close the dangling session: ${all.toSeq}")
      assert(all.exists(s => s.user_id == 11 && s.n_events == 2 &&
        s.session_start == ts(149) && s.session_end == ts(150)),
        s"late in-watermark event must extend the session backwards: ${all.toSeq}")
    } finally q.stop()
  }

  test("sessionize with watermarkDelay > gap: late events bridge, never split or over-merge") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    // gap 5 min, watermark 45 min: gap-proof alone must NOT emit — a late
    // in-watermark event can still bridge two open sessions
    val sessions = StreamOps.sessionize(
      spark, in.toDF.toDF("user_id", "ts"), gapMinutes = 5, watermarkDelay = "45 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess2").outputMode("append").start()
    try {
      // user 21: 0, then 8 (> gap apart), then LATE 4 bridges them into ONE
      in.addData((21L, ts(0)))
      q.processAllAvailable()
      in.addData((21L, ts(8)))
      q.processAllAvailable()
      in.addData((21L, ts(4)))
      q.processAllAvailable()
      // user 23: 60, then LATE 20 — 40 min BEFORE the open session, far
      // outside the gap: must be its OWN session, not merged backwards
      in.addData((23L, ts(60)))
      q.processAllAvailable()
      in.addData((23L, ts(20)))
      q.processAllAvailable()
      // push the watermark far past everything (wm = 180 - 45 = 135)
      in.addData((99L, ts(180)))
      q.processAllAvailable()
      in.addData((99L, ts(181)))
      q.processAllAvailable()
      val got = spark.table("sess2").as[StreamOps.SessionOut].collect()
      val u21 = got.filter(_.user_id == 21L).map(s => (s.session_start, s.session_end, s.n_events))
      assert(u21.toSeq === Seq((ts(0), ts(8), 3L)),
        s"late bridge must yield ONE final session, got ${u21.toSeq}")
      val u23 = got.filter(_.user_id == 23L)
        .map(s => (s.session_start, s.session_end, s.n_events)).sortBy(_._1.getTime)
      assert(u23.toSeq === Seq((ts(20), ts(20), 1L), (ts(60), ts(60), 1L)),
        s"an event outside the gap must not merge backwards, got ${u23.toSeq}")
    } finally q.stop()
  }
}
