package graft

import graft.operators.StarQueries
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Streaming-vs-batch consistency: the streaming tumbling-window result
  * must equal the batch q27 (which is itself DuckDB-oracle-checked). */
class StreamingSpec extends SparkTestBase {

  test("streaming hourly agg equals the batch tumbling window (q27 triangle)") {
    val streamed = EventStream.runBounded(spark, Sf0001, "agg_spec")
      .select(col("hour_start"), col("event_type"), col("n"),
        round(col("total_value"), 4).as("tv"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = StarQueries.q27TumblingWindow(spark, Sf0001)
      .select(col("hour_start"), col("event_type"), col("n"),
        round(col("total_value"), 4).as("tv"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed === batch)
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

  test("mapGroupsWithState per-user counters match batch groupBy") {
    val streamed = EventStream.userCounts(spark, Sf0001, "user_spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }
}
