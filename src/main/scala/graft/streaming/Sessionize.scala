package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** One event, microsecond event time (`us`), with the timestamp column
  * Structured Streaming needs for watermarking.
  */
final case class SessEvent(
    user_id: Long,
    us: Long,
    event_time: java.sql.Timestamp,
    value: Double)

/** Per-user open-session state carried between micro-batches. */
final case class SessState(startUs: Long, lastUs: Long, n: Long, total: Double)

/** A closed session. */
final case class Session(
    user_id: Long,
    start_us: Long,
    end_us: Long,
    n_events: Long,
    total_value: Double)

/** Gap-based sessionization — the canonical custom-state streaming
  * operator (SURVEY.md §7.7 scale extensions): a user's events belong to
  * one session until a silence longer than `gapUs`; the session then
  * closes and is emitted.
  *
  * Two forms with identical semantics:
  *  - [[batch]]: lag/cumulative-sum window functions — one shuffle on
  *    user_id, linear in events, ANSI-SQL-expressible (oracle-verified
  *    as `q_events_sessionize`);
  *  - [[stream]]: `flatMapGroupsWithState` with event-time timeout —
  *    state per ACTIVE user only (bounded by the watermark horizon, not
  *    by history), sessions emit exactly once when the watermark passes
  *    their gap.
  */
object Sessionize {

  /** Batch sessionization over a microsecond-epoch column.
    *
    * @param tieCol deterministic tiebreak for equal timestamps (window
    *               order must be total or lag() is nondeterministic)
    */
  def batch(
      events: DataFrame,
      userCol: String,
      usCol: String,
      valueCol: String,
      tieCol: String,
      gapUs: Long
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(usCol), col(tieCol))
    val newSession =
      when(col(usCol) - lag(col(usCol), 1).over(w) > gapUs, 1).otherwise(0)
    events
      .withColumn("__new", newSession)
      .withColumn("__sess",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sess").cast("long").as("session_seq"))
      .agg(
        min(col(usCol)).as("start_us"),
        max(col(usCol)).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(18, 4))).cast("double").as("total_value")
      )
  }

  /** Streaming sessionization. Input must carry an `event_time`
    * timestamp column (see [[IncrementalSync.eventsStream]]); closed
    * sessions append once the watermark passes `session end + gap`.
    */
  def stream(
      events: Dataset[SessEvent],
      gapUs: Long,
      watermark: String = "30 minutes"
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: the open session is closed
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.startUs, s.lastUs, s.n, s.total))
          } else {
            val sorted = rows.toIndexedSeq.sortBy(e => (e.us, e.value))
            var open = state.getOption
            val closed = IndexedSeq.newBuilder[Session]
            sorted.foreach { e =>
              open match {
                case Some(s) if e.us - s.lastUs > gapUs =>
                  closed += Session(user, s.startUs, s.lastUs, s.n, s.total)
                  open = Some(SessState(e.us, e.us, 1L, e.value))
                case Some(s) =>
                  open = Some(SessState(s.startUs, math.max(s.lastUs, e.us),
                    s.n + 1, s.total + e.value))
                case None =>
                  open = Some(SessState(e.us, e.us, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire when the event-time watermark passes the gap horizon
              state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
