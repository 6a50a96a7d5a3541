package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/output rows for the transformWithState probe (top-level case
  * classes so their Encoders serialize cleanly into the stream plan). */
case class EvRow(user_id: Long, event_type: String, cents: Long)
case class UserTotals(user_id: Long, n_events: Long, purchase_cents: Long)

/** Per-user running totals on Spark 4's arbitrary-state v2 API
  * (transformWithState + StatefulProcessor): one ValueState cell per
  * user carrying (event count, purchase cents), updated per input row,
  * emitted per micro-batch the key appears in (Update mode).
  *
  * This is the modern replacement for mapGroupsWithState (which
  * EventStream.userCounts still exercises for coverage): typed state
  * cells come from a handle instead of one opaque state object, TTL is
  * a per-cell config instead of manual timeout bookkeeping, and the
  * runtime requires the RocksDB state store — the production choice at
  * 100 TB anyway, since per-key state lives off-heap and snapshots
  * incrementally (changelog checkpointing) instead of rewriting HDFS
  * state files per batch.
  *
  * All arithmetic is int64 (value pre-routed to cents), so the final
  * state is bit-comparable to the batch rollup no matter how the input
  * splits into micro-batches — associativity is the whole contract.
  */
/** Input/output rows for the timer-driven sessionizer. */
case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

/** Custom event-time SESSIONIZATION on the v2 API's TIMER surface — the
  * one stateful capability the other processors don't exercise: state
  * that must act when the WATERMARK passes a point, not when input
  * arrives. Each key buffers its event times in a ListState; every
  * input batch (re)arms an event-time timer just past the newest
  * buffered event's session horizon; when a timer fires, the buffer is
  * split into 30-minute-gap islands and every island whose session_end
  * (last event + gap — the session_window convention) is strictly
  * before the current watermark is emitted and evicted. An island can
  * never emit twice (emitted events leave the buffer) and can never
  * emit early (the watermark guard), and rows below the watermark were
  * already dropped pre-state by the engine — so the emitted set is
  * exactly the closed gaps-and-islands sessions, regardless of how
  * input splits into batches.
  *
  * Timer arithmetic: timers are epoch MILLIS while events are micros;
  * arming at floor_ms(session_end) + 1 guarantees that when the timer
  * fires, watermark_ms * 1000 > session_end_micros exactly — no
  * sub-millisecond session can get stuck armed-but-never-checked.
  *
  * State per key is the OPEN tail of its event history (closed islands
  * evict on emission), so state is bounded by the session gap x event
  * rate, not by history — the same bound session_window keeps.
  */
class TimerSessionProcessor extends StatefulProcessor[Long, SessEvent, SessionOut] {
  private val GapMicros = 30L * 60 * 1000000L
  @transient private var buf: ListState[Long] = _
  // currently armed expiry (ms): ONE live timer per key — re-arming at a
  // later horizon deletes the superseded timer first, so a key touched in
  // k batches fires once per closed island, not k times (each stale
  // firing would re-read, sort, and re-partition the whole buffer just
  // to usually re-arm)
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[Long]("buf", Encoders.scalaLong, TTLConfig.NONE)
    armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def micros(t: java.sql.Timestamp): Long =
    (t.getTime - t.getNanos / 1000000) * 1000L + t.getNanos / 1000

  private def ts(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos((us % 1000000).toInt * 1000)
    t
  }

  private def arm(lastMicros: Long): Unit = {
    val target = (lastMicros + GapMicros) / 1000L + 1L
    if (!armed.exists()) {
      getHandle.registerTimer(target)
      armed.update(target)
    } else if (target < armed.get()) {
      // never hit under time-ordered staging (per-key horizons grow
      // monotonically); kept so out-of-order arming can only move the
      // timer EARLIER, which is always safe for the chain below
      getHandle.deleteTimer(armed.get())
      getHandle.registerTimer(target)
      armed.update(target)
    }
    // else: an earlier timer is already armed. Its firing re-arms off
    // the open tail (which includes the events that produced `target`),
    // so every later horizon stays reachable through that chain — the
    // NEXT timer is never armed past the final watermark while a closed
    // island is still buffered. Registering the later horizon here too
    // is exactly the superseded per-batch timer this bookkeeping
    // removes: it would fire after the chain already emptied the
    // buffer, re-reading and re-sorting the key's state for nothing.
  }

  override def handleInputRows(key: Long, rows: Iterator[SessEvent],
      timerValues: TimerValues): Iterator[SessionOut] = {
    var last = Long.MinValue
    rows.foreach { r =>
      val us = micros(r.ts)
      buf.appendValue(us)
      if (us > last) last = us
    }
    if (last != Long.MinValue) arm(last)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
    // the firing timer is consumed by the engine; drop the bookkeeping
    // entry if it refers to exactly this expiry so a re-arm below won't
    // try to delete an already-consumed timer
    if (armed.exists() && armed.get() == expiredTimerInfo.getExpiryTimeInMs)
      armed.clear()
    val events = buf.get().toArray.sorted
    if (events.isEmpty) return Iterator.empty
    val wmMicros = timerValues.getCurrentWatermarkInMs * 1000L
    // split into 30-min-gap islands
    val islands = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer(events.head))
    events.tail.foreach { e =>
      if (e - islands.last.last > GapMicros) islands += scala.collection.mutable.ArrayBuffer(e)
      else islands.last += e
    }
    val (closed, open) = islands.partition(i => i.last + GapMicros < wmMicros)
    if (open.isEmpty) buf.clear()
    else {
      buf.put(open.flatten.toArray)
      arm(open.map(_.last).max)
    }
    closed.iterator.map { i =>
      SessionOut(key, ts(i.head), ts(i.last + GapMicros), i.length.toLong)
    }
  }
}

/** Input/output rows for the MapState transition counter. */
case class TsEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)
case class Transition(user_id: Long, prev_type: String, event_type: String, n: Long)

/** Per-user event-type TRANSITION counts on the v2 API's MapState — the
  * third typed state cell (st09 covers ValueState, the timer
  * sessionizer ListState): a ValueState carries the user's last seen
  * (ts, event_id, type) across batches; a MapState keyed by
  * "prev->curr" accumulates the transition counts. Emissions (Update
  * mode) re-publish the user's full current matrix each batch the user
  * appears in; the final state is the last emission per key.
  *
  * Correct cross-batch ordering is the caller's contract: input rows
  * are sorted (ts, event_id) WITHIN the batch here, and arrival files
  * must be TIME-RANGE ordered (st10's staging) so concatenating
  * batches preserves each user's global event order — then the counted
  * transitions equal the batch LAG-over-(ts, event_id) pairs exactly.
  */
class TransitionProcessor extends StatefulProcessor[Long, TsEvent, Transition] {
  @transient private var last: ValueState[(Long, Long, String)] = _
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    last = getHandle.getValueState[(Long, Long, String)]("last",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING),
      TTLConfig.NONE)
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[TsEvent],
      timerValues: TimerValues): Iterator[Transition] = {
    val sorted = rows.toArray.sortBy(r =>
      ((r.ts.getTime - r.ts.getNanos / 1000000) * 1000L + r.ts.getNanos / 1000, r.event_id))
    var prev = if (last.exists()) Option(last.get()) else None
    sorted.foreach { r =>
      val us = (r.ts.getTime - r.ts.getNanos / 1000000) * 1000L + r.ts.getNanos / 1000
      prev.foreach { case (_, _, pt) =>
        val k = pt + "->" + r.event_type
        val cur = if (counts.containsKey(k)) counts.getValue(k) else 0L
        counts.updateValue(k, cur + 1L)
      }
      prev = Some((us, r.event_id, r.event_type))
    }
    prev.foreach(last.update)
    counts.iterator().map { case (k, n) =>
      val Array(p, c) = k.split("->", 2)
      Transition(key, p, c, n)
    }
  }
}

class UserTotalsProcessor extends StatefulProcessor[Long, EvRow, UserTotals] {
  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EvRow],
      timerValues: TimerValues): Iterator[UserTotals] = {
    var (n, pc) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { r =>
      n += 1
      if (r.event_type == "purchase") pc += r.cents
    }
    totals.update((n, pc))
    Iterator.single(UserTotals(key, n, pc))
  }
}
