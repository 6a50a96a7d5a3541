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

  test("mapGroupsWithState per-user counters match batch groupBy") {
    val streamed = EventStream.userCounts(spark, Sf0001, "user_spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, Sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }
}
