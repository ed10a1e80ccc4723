package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming aggregations over the envelope/event stream — the
  * Structured Streaming half of the §2.2 "streaming windows / sessionization /
  * watermarks" category (the batch mirrors are q15/q16).
  *
  * These are plan fragments applied to an unbounded DataFrame: watermarked
  * tumbling-window counts (late data dropped past the watermark), and
  * arbitrary-state sessionization via `flatMapGroupsWithState` with
  * event-time timeout — the engine-level building block the reference lacks
  * entirely (its events carry processing time only, `handler.go:133`).
  */
object StreamingAggs {

  /** Streaming NEAR-duplicate dedup: fingerprint each document row-locally
    * ([[graft.llm.TextAnalysis.fingerprintCol]] — the same min-4-gram value
    * as the batch fingerprint op, computed without the batch path's
    * aggregation barrier) and keep the first arrival per fingerprint within
    * the watermark. State is keyed by the 60-bit fingerprint and evicted past
    * the watermark — bounded at any corpus rate, the streaming complement of
    * the batch near-dup family (near-identical docs collapse to one
    * fingerprint; the batch operators remain the recall-grade path). */
  def fingerprintDedup(docs: DataFrame, tsCol: String, textCol: String,
                       watermarkDelay: String): DataFrame =
    docs
      .withColumn("fp", graft.llm.TextAnalysis.fingerprintCol(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Tumbling event-time window counts with a watermark: aggregation state for
    * windows older than the watermark is dropped (bounded state at scale). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))

  /** Watermarked stream-stream INNER interval join: a left row matches right
    * rows with the equal key whose event time lies in
    * `[l.ts − beforeSec, l.ts + afterSec]`.
    *
    * Both sides carry watermarks AND the join predicate bounds the two event
    * times against each other — together that lets Spark evict buffered rows
    * once the other side's watermark passes their interval, so per-side state
    * is bounded at scale. Without the time-range predicate the join would
    * buffer both streams forever (the unbounded-state hazard; Spark rejects
    * some of those plans outright). Column names must be disjoint across the
    * two inputs (`lKey`/`rKey`, `lTs`/`rTs` name the respective sides). */
  def intervalJoin(left: DataFrame, lKey: String, lTs: String,
                   right: DataFrame, rKey: String, rTs: String,
                   watermarkDelay: String, beforeSec: Long, afterSec: Long): DataFrame =
    left.withWatermark(lTs, watermarkDelay)
      .join(right.withWatermark(rTs, watermarkDelay),
        col(lKey) === col(rKey) &&
          col(rTs) >= col(lTs) - expr(s"INTERVAL $beforeSec seconds") &&
          col(rTs) <= col(lTs) + expr(s"INTERVAL $afterSec seconds"))

  final case class SessionIn(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionOut(user_id: Long, n_events: Long, dur_s: Long)
  // Public: the state encoder's generated code instantiates it reflectively.
  final case class SessionState(n: Long, startMs: Long, lastMs: Long)

  /** Inactivity-gap sessionization with explicit state: a session closes when
    * no event arrives for `gapSec` (event-time timeout keyed by watermark).
    * This is the `flatMapGroupsWithState` form of q15's batch sessionization. */
  def sessionize(events: Dataset[SessionIn], gapSec: Long): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    events
      .withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[SessionIn], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.n, (s.lastMs - s.startMs) / 1000))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapSec * 1000 =>
                  // LATE events (flatMapGroupsWithState does not drop rows
                  // behind the watermark) must never move the session's end
                  // backwards: a regressed lastMs shrinks the timeout (early
                  // close, negative durations) and can even fall below the
                  // watermark, where setTimeoutTimestamp THROWS and poisons
                  // the batch. Merge with max/min instead.
                  cur = Some(s.copy(n = s.n + 1,
                    lastMs = math.max(s.lastMs, t), startMs = math.min(s.startMs, t)))
                case Some(s) =>
                  closed ::= SessionOut(user, s.n, (s.lastMs - s.startMs) / 1000)
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp: a fully-late session's natural timeout may already be
              // behind the watermark — fire at the next advance instead
              state.setTimeoutTimestamp(
                math.max(s.lastMs + gapSec * 1000, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
