package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming: gap-based sessionization of the events stream with
  * `flatMapGroupsWithState` — the custom-state operator family the engine
  * exposes beyond windowed aggregation. Pure Scala state logic; the same
  * function is exercised in batch tests through `mapGroups`-equivalent
  * folding and in streaming through the state store.
  *
  * State per user is a single open session (start, last, count, sum) —
  * bounded, timeout-evicted; nothing grows with stream length.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double) {
    def ts_us: Long = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  }
  final case class Session(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long, total_value: Double)

  private[streaming] final case class OpenSession(
      start_us: Long, last_us: Long, n: Long, sum: Double)

  /** Close a session after 30 min of user inactivity. */
  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** Fold a user's (sorted) events into closed sessions + the open tail. */
  private[streaming] def foldEvents(
      events: Iterator[Event], open: Option[OpenSession]): (Seq[Session], Option[OpenSession]) = {
    var cur = open
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    var uid = 0L
    events.toSeq.sortBy(_.ts_us).foreach { e =>
      uid = e.user_id
      cur match {
        case Some(s) if e.ts_us - s.last_us <= GapUs =>
          cur = Some(OpenSession(s.start_us, e.ts_us, s.n + 1, s.sum + e.value))
        case Some(s) =>
          closed += Session(e.user_id, s.start_us, s.last_us, s.n, s.sum)
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          cur = Some(OpenSession(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    (closed.toSeq, cur)
  }

  private def stateFn(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(userId, s.start_us, s.last_us, s.n, s.sum))
    } else {
      val (closed, open) = foldEvents(events, state.getOption)
      open match {
        case Some(s) =>
          state.update(s)
          // evict once the event-time watermark passes last activity + gap
          state.setTimeoutTimestamp(s.last_us / 1000L + GapUs / 1000L)
        case None => ()
      }
      closed.iterator.map(c => c.copy(user_id = userId))
    }
  }

  /** Streaming sessionization over a typed event stream. Event-time timeout:
    * an idle session is closed when the watermark passes its last activity
    * plus [[GapUs]] — no wall-clock coupling, no empty-batch busy loops. */
  def sessions(events: Dataset[Event])(implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(stateFn)
  }

  /** Batch reference implementation over the same fold (for parity specs). */
  def sessionsBatch(events: Dataset[Event])(implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, evs) =>
        val (closed, open) = foldEvents(evs, None)
        (closed ++ open.map(s => Session(uid, s.start_us, s.last_us, s.n, s.sum))).iterator
      }
  }
}
