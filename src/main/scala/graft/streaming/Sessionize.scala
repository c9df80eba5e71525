package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Stateful streaming sessionization via flatMapGroupsWithState — the
  * custom-state operator the brief calls for (KeyValueGroupedDataset
  * surface). Gap-based sessions per user: a session closes when no event
  * arrives within `gapSeconds` of its last event (decided by the
  * event-time watermark via EventTimeTimeout, so late data inside the
  * watermark still extends the right session).
  *
  * Batch twin: q27_sessionization (lag + running-sum windows) — the
  * streaming and batch paths produce the same session boundaries for the
  * same input, which StreamingSessionSpec asserts.
  */
object Sessionize {

  final case class Evt(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int)

  def sessionize(events: Dataset[Evt], gapSeconds: Long): Dataset[Session] = {
    implicit val evtEnc = Encoders.product[Evt]
    implicit val outEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong

    def flush(userId: Long, st: SessionState): Session =
      Session(userId, new Timestamp(st.start * 1000),
        new Timestamp(st.last * 1000), st.n)

    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Evt], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val out = state.getOption.map(flush(userId, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              cur match {
                case Some(st) if sec - st.last <= gapSeconds =>
                  cur = Some(st.copy(last = math.max(st.last, sec), n = st.n + 1))
                case Some(st) =>
                  closed ::= flush(userId, st)
                  cur = Some(SessionState(sec, sec, 1))
                case None =>
                  cur = Some(SessionState(sec, sec, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp((st.last + gapSeconds) * 1000 + 1)
            }
            closed.reverse.iterator
          }
      }
  }
}
