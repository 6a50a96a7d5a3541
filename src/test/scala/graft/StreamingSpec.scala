package graft

import graft.operators.StarQueries
import graft.streaming.{CorpusStream, EventStream}
import org.apache.spark.sql.functions._

/** Streaming-vs-batch consistency: the streaming tumbling-window result
  * must equal the batch q27 (which is itself DuckDB-oracle-checked). */
class StreamingSpec extends SparkTestBase {

  test("streaming hourly agg equals the batch tumbling window (q27 triangle)") {
    // bit-exact, no rounding: both sides route the double sum through the
    // same decimal cast, so the values are order-independent
    val streamed = EventStream.runBounded(spark, Sf0001, "agg_spec")
      .select(col("hour_start"), col("event_type"), col("n"), col("total_value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = StarQueries.q27TumblingWindow(spark, Sf0001)
      .select(col("hour_start"), col("event_type"), col("n"), col("total_value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed === batch)
  }

  test("stream-static enrichment join matches the batch join (hourly revenue per segment)") {
    val streamed = EventStream.runEnriched(spark, Sf0001, "enrich_spec")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "purchase")
      .join(Tables.customer(spark, Sf0001)
          .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_purchases"),
        Tables.dsum(col("value"), 30, 2).as("revenue"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed === batch, "stream-static join diverged from the batch twin")
    assert(streamed.nonEmpty)
  }

  test("stream-stream join (purchase after click, 1h) matches the batch range join") {
    val streamed = EventStream.runPurchaseAfterClick(spark, Sf0001, "ss_join_spec")
      .select(col("p_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = Tables.events(spark, Sf0001)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("p_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("c_id"))
    val batch = p.join(c,
        col("pu") === col("cu") && col("cts") <= col("pts") &&
          col("cts") >= col("pts") - expr("INTERVAL 1 HOUR"))
      .select(col("p_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture should produce at least one purchase-after-click pair")
  }

  test("streaming dropDuplicatesWithinWatermark equals batch distinct on the key") {
    val streamed = EventStream.runDedup(spark, Sf0001, "dedup_spec")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val batch = Tables.events(spark, Sf0001)
      .select(col("user_id"), date_trunc("minute", col("ts")).as("minute"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(streamed === batch)
    // the fixture must actually contain duplicates for this to test anything
    assert(batch.size < Tables.events(spark, Sf0001).count())
  }

  test("streaming session windows equal the batch session_window agg (q34 tie-in)") {
    // Append mode emits a session only once the watermark passes its end;
    // on a bounded run the final watermark is maxTs - 2h, so sessions
    // ending inside that horizon legitimately stay open. The spec asserts
    // (a) every emitted session matches batch exactly and (b) every
    // non-emitted batch session ends inside the open horizon.
    val streamed = EventStream.runSessionAgg(spark, Sf0001, "sess_spec")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getLong(2)).toMap
    val batchRows = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start"),
        col("session_window.end"), col("n_events"))
      .collect()
    val batch = batchRows.map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getLong(3)).toMap
    val maxTsMicros = Tables.events(spark, Sf0001)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val watermarkMicros = maxTsMicros - 2L * 3600 * 1000000
    streamed.foreach { case (k, n) =>
      assert(batch.get(k).contains(n), s"streamed session $k -> $n not in batch")
    }
    batchRows.foreach { r =>
      val k = (r.getLong(0), r.getTimestamp(1))
      if (!streamed.contains(k)) {
        val endMicros = r.getTimestamp(2).getTime * 1000
        assert(endMicros >= watermarkMicros,
          s"closed session $k (end before watermark) was never emitted")
      }
    }
    assert(streamed.nonEmpty && streamed.size < batch.size)
  }

  test("foreachBatch file sink: last batch directory equals the batch aggregation") {
    val out = s"/tmp/graft_stream_sink_${ProcessHandle.current().pid()}"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (new java.io.File(out).exists()) rm(new java.io.File(out))
    EventStream.runHourlyToFiles(spark, Sf0001, out)
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("batch_"))
    assert(dirs.nonEmpty, "at least one micro-batch directory must exist")
    val last = dirs.map(_.stripPrefix("batch_").toLong).max
    val sunk = spark.read.parquet(s"$out/batch_$last")
      .select(col("hour_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = StarQueries.q27TumblingWindow(spark, Sf0001)
      .select(col("hour_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sunk === batch)
  }

  test("flatMapGroupsWithState timeout sessions match batch sessionization") {
    // Sessions closed by a longer gap within the stream emit inline; the
    // final open session per user emits only if the event-time watermark
    // (maxTs - 2h on a bounded run) passes its last_event + gap timeout.
    val streamed = EventStream.timeoutSessions(spark, Sf0001, "timeout_sess_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batchRows = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .collect()
    val batch = batchRows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    streamed.foreach { case (k, n) =>
      assert(batch.get(k).contains(n), s"streamed session $k -> $n not in batch")
    }
    val maxTsMicros = Tables.events(spark, Sf0001)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val watermarkMicros = maxTsMicros - 2L * 3600 * 1000000
    batchRows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      if (!streamed.contains(k))
        // batch session end = last event + gap = exactly the timeout ts
        assert(r.getLong(2) >= watermarkMicros,
          s"session $k timed out inside the horizon but was never emitted")
    }
    assert(streamed.nonEmpty)
  }

  test("mapGroupsWithState per-user counters match batch groupBy") {
    val streamed = EventStream.userCounts(spark, Sf0001, "user_spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("streaming corpus ingestion dedup matches batch distinct fingerprints per source") {
    val streamed = CorpusStream.runBounded(spark, Sf0001, "corpus_dedup_spec")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch twin: d01's fingerprint definition, counted distinct per source
    val batch = Tables.documents(spark, Sf0001)
      .groupBy(col("source"))
      .agg(countDistinct(md5(Tables.canonText(col("text")))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }
}
