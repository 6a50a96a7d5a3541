package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table.
  *
  * The reference has no streaming surface (SURVEY.md §2.9) — this is the
  * north-star tier: the same declarative plan (`window` + agg) runs
  * identically over a bounded directory (tests) and an unbounded source at
  * scale; state lives in the state store keyed by (window, event_type), so
  * executors scale horizontally.
  *
  * Tests validate the streaming result against the batch tumbling-window
  * query (operators.StarQueries.q27), which is itself DuckDB-oracle-checked
  * — a streaming-vs-batch-vs-oracle triangle.
  */
object EventStream {

  /** Unbounded read of the events data. The trailing glob keeps
    * FileStreamSource's basePath at the (directory) level even though the
    * harness ships events as a single parquet file; a production deployment
    * points this at a directory of arriving files.
    *
    * FileStreamSource requires a user-supplied schema; hardcoding one broke
    * when the testdata's physical ts type drifted (INT64 nanos -> parquet
    * timestamp[us]/NTZ), so we peek the footer schema with a one-off batch
    * read (metadata only, no data scan) and normalize ts from whatever the
    * footer says via Tables.normalizeTs — the same path the batch loader
    * uses, so streaming and batch can never disagree on event time again.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val physical: StructType = spark.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.normalizeTs(
      spark.readStream
        .schema(physical)
        .parquet(s"$dir/events.parque[t]"))
  }

  /** 1-hour tumbling window counts/sums with a 2-hour watermark — the
    * streaming twin of the batch q27. The decimal-routed sum matches
    * q27's dsum exactly, so streaming and batch agree bit-for-bit, not
    * just after rounding.
    *
    * State note: in Append/Update mode the watermark evicts closed
    * windows (state O(active windows x types)); the bounded-run helpers
    * below use Complete mode to surface the full result table, which
    * retains all windows — an unbounded production deployment pairs this
    * aggregation with Append mode + a real sink (see runHourlyToFiles'
    * per-batch snapshot pattern).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("total_value"))

  /** Run the streaming aggregation to completion over the bounded input and
    * return the result as a static frame (memory sink, complete mode).
    */
  def runBounded(spark: SparkSession, dir: String, queryName: String = "graft_events_agg"): DataFrame = {
    val q = hourlyAgg(readEvents(spark, dir))
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  // ------------------------------------------------------------------
  /** Stream-stream join: purchases joined to the same user's clicks within
    * the preceding hour. Both sides watermarked so the state store can
    * evict rows older than the join window — the standard bounded-state
    * stream-stream join shape. Validated against the equivalent batch
    * range join in tests.
    */
  def purchaseAfterClick(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value").as("p_value"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
  }

  /** LEFT OUTER stream-stream join — purchaseAfterClick's bounds with
    * outer semantics: a purchase with no qualifying click must still
    * emit (c_id null), but only once the watermark proves no matching
    * click can still arrive — the engine holds the unmatched row in
    * state until the click side's event-time range [p_ts - 1h, p_ts]
    * is entirely below the watermark, then releases it with nulls.
    * That delayed-null emission is THE semantic difference from the
    * inner form (st03), and the reason outer stream joins need both
    * watermarks and time bounds at all. */
  def purchaseLeftClick(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value").as("p_value"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
  }

  def runPurchaseAfterClick(spark: SparkSession, dir: String, queryName: String = "graft_ss_join"): DataFrame = {
    val q = purchaseAfterClick(readEvents(spark, dir))
      .select(col("p_id"), col("c_id"), col("p_user"), col("p_value"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming exact dedup — the unbounded twin of the batch d01 operator:
    * keep the first event per (user_id, minute) key. State is bounded by
    * the watermark: dropDuplicatesWithinWatermark evicts keys once the
    * event-time watermark passes them, so state is O(keys per watermark
    * horizon), not O(stream length) — the only dedup that survives an
    * unbounded stream. Only the key columns are emitted (which duplicate
    * wins is arbitrary), keeping the result deterministic.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withColumn("minute", date_trunc("minute", col("ts")))
      .withWatermark("minute", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "minute")
      .select(col("user_id"), col("minute"))

  def runDedup(spark: SparkSession, dir: String, queryName: String = "graft_stream_dedup"): DataFrame = {
    val q = dedupedEvents(readEvents(spark, dir))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming session windows (30-minute gap) — the unbounded twin of the
    * batch q34: per-user sessions close when the watermark passes the gap,
    * so completed sessions emit incrementally (append mode) and state
    * holds only open sessions.
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))

  def runSessionAgg(spark: SparkSession, dir: String, queryName: String = "graft_stream_sessions"): DataFrame = {
    val q = sessionAgg(readEvents(spark, dir))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Stream-static enrichment join — the remaining join shape of the
    * streaming tier (purchaseAfterClick covers stream-stream): the
    * unbounded purchase stream joins the STATIC customer dimension on
    * user_id. No watermark is needed on the static side and no state is
    * kept for it — each micro-batch plans a fresh join against the
    * (broadcastable) dimension, which also means dimension updates are
    * picked up between batches. Output: hourly revenue per market
    * segment, the live dashboard feed; decimal-routed sums so the
    * streaming result is bit-comparable to the batch twin in tests.
    */
  def enrichedBySegment(events: DataFrame, customers: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
      .join(customers.select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("revenue"))
      .select(col("window.start").as("hour_start"), col("c_mktsegment"),
        col("n_purchases"), col("revenue"))

  def runEnriched(spark: SparkSession, dir: String, queryName: String = "graft_stream_enriched"): DataFrame = {
    val customers = graft.Tables.customer(spark, dir)
    val q = enrichedBySegment(readEvents(spark, dir), customers)
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** foreachBatch file sink with idempotent per-batch directories — the
    * production exactly-once pattern: each micro-batch writes to
    * out/batch_<id> with overwrite mode, so a replayed batch (failure
    * recovery re-runs the last uncommitted batch) lands in the same
    * directory instead of duplicating rows. The aggregation state comes
    * from the engine; the sink only needs batch-id idempotence.
    */
  def runHourlyToFiles(spark: SparkSession, dir: String, outDir: String): Unit = {
    val q = hourlyAgg(readEvents(spark, dir))
      .writeStream
      .outputMode(OutputMode.Complete)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Custom stateful operator: running per-user event counter + last-seen
    * timestamp via mapGroupsWithState — the KeyValueGroupedDataset state
    * API the prompt's streaming tier calls for. State per user is O(1).
    */
  case class UserEvent(user_id: Long, tsMicros: Long)
  case class UserState(n: Long, lastMicros: Long)

  def userCounts(spark: SparkSession, dir: String, queryName: String = "graft_user_state"): DataFrame = {
    import spark.implicits._
    val events = readEvents(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[UserEvent]
    val counted = events
      .groupByKey(_.user_id)
      // NoTimeout is fine for the bounded harness run; an unbounded
      // deployment with an open-ended key space sets an event-time or
      // processing-time timeout and removes expired state, like the
      // watermark-bounded operators above
      .mapGroupsWithState[UserState, (Long, Long, Long)](GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var n = prev.n
          var last = prev.lastMicros
          rows.foreach { e => n += 1; if (e.tsMicros > last) last = e.tsMicros }
          state.update(UserState(n, last))
          (uid, n, last)
      }
      .toDF("user_id", "n_events", "last_seen_micros")
    val q = counted.writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Update mode + memory sink appends every batch's updated rows, so a
    // multi-batch run leaves stale earlier snapshots per user; n_events
    // grows monotonically, so the max row per user IS the current state
    spark.table(queryName)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"), max(col("last_seen_micros")).as("last_seen_micros"))
  }

  // ------------------------------------------------------------------
  /** Custom sessionization via flatMapGroupsWithState with an EVENT-TIME
    * TIMEOUT — the full custom-state API surface that session_window
    * (above) hides: explicit per-key state, multi-row emission, and
    * watermark-driven state EVICTION. The built-in covers fixed-gap
    * sessions; this operator is the template for session logic the
    * built-in can't express (per-session value caps, custom close rules).
    *
    * Per user: events extend the open session while the gap stays under
    * 30 minutes; a longer gap closes it (emitted inline) and opens a new
    * one. The open session registers a timeout at last_event + gap; when
    * the event-time watermark passes that, the state times out, emits the
    * closed session, and is REMOVED — state is O(open sessions), never
    * O(users), which is what survives an unbounded key space at scale.
    */
  /** ts stays in the projection (not just the derived micros): the
    * event-time-timeout checker requires the WATERMARKED column to be
    * present on the stateful operator's input. */
  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, tsMicros: Long)
  case class SessState(startMicros: Long, lastMicros: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start_micros: Long, n_events: Long)

  private val SessionGapMicros: Long = 30L * 60 * 1000000

  def timeoutSessions(spark: SparkSession, dir: String, queryName: String = "graft_timeout_sessions"): DataFrame = {
    import spark.implicits._
    val events = readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tsMicros"))
      .as[SessEvent]
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last_event + gap: the session is closed for
            // good (no earlier event can still arrive) — emit and evict
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.startMicros, s.n))
          } else {
            // within-batch order is not guaranteed; per-user-per-batch
            // volume is small, so a local sort is safe at any scale
            val sorted = rows.toArray.sortBy(_.tsMicros)
            val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMicros - s.lastMicros <= SessionGapMicros =>
                  cur = Some(s.copy(lastMicros = e.tsMicros, n = s.n + 1))
                case Some(s) =>
                  out += ClosedSession(uid, s.startMicros, s.n)
                  cur = Some(SessState(e.tsMicros, e.tsMicros, 1))
                case None =>
                  cur = Some(SessState(e.tsMicros, e.tsMicros, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout fires once watermark > last + gap (API takes ms)
              state.setTimeoutTimestamp((s.lastMicros + SessionGapMicros) / 1000)
            }
            out.iterator
          }
      }
      .toDF("user_id", "session_start_micros", "n_events")
    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
