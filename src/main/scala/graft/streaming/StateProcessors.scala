package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
