package graft.operators

import graft.Sidecars
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Driver-contract STREAMING queries — each runs a genuine Structured
  * Streaming job over the events data to completion and returns the
  * materialized result, which the driver then hash-compares against a
  * pure BATCH DuckDB oracle over the same table. That is the
  * stream/batch equivalence contract stated as a correctness row: the
  * incremental engine (micro-batches, state store, watermarks) must land
  * on exactly the answer the one-shot batch plan computes. StreamingSpec
  * covers the tier's behavioral surface (joins, sessions, custom state);
  * these two entries put the equivalence under the driver's oracle hash.
  */
object StreamingQueries {

  private def deleteRecursively(path: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(path)) {
      java.nio.file.Files.walk(path)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  /** Hourly tumbling-window rollup, streamed: readStream → watermark +
    * window agg → foreachBatch sink (Complete mode, AvailableNow) — the
    * production exactly-once snapshot pattern: every micro-batch
    * overwrites the result directory with the full updated aggregate, so
    * a replayed batch lands idempotently and the LAST batch leaves the
    * final table. The checkpoint is recreated per run (full deterministic
    * replay — this is a correctness probe, not an incremental deployment;
    * the incremental path with a persistent checkpoint is
    * EventStream.runHourlyToFiles).
    *
    * Oracle: the batch q27 arithmetic (DATE_TRUNC + COUNT + DECIMAL-
    * routed SUM) over raw events — no sidecar, no restatement of the
    * streaming machinery. Hash equality means micro-batched incremental
    * aggregation == one-shot batch aggregation, bit for bit: the
    * decimal-routed sum makes the comparison exact, not rounded.
    *
    * Scale: state is O(active windows x event types) under the
    * watermark in an unbounded deployment; the bounded audit run retains
    * all windows (Complete), which at any sf is a few thousand rows.
    */
  def st01StreamHourly(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_stream_${Sidecars.tag(dir)}/st01"
    deleteRecursively(java.nio.file.Paths.get(root))
    val q = EventStream.hourlyAgg(EventStream.readEvents(s, dir))
      .writeStream
      .outputMode(OutputMode.Complete)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        batch.write.mode("overwrite").parquet(s"$root/result")
      }
      .option("checkpointLocation", s"$root/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(s"$root/result").orderBy(col("hour_start"), col("event_type"))
  }

  val st01Sql: String =
    """SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(30,2))) AS VARCHAR) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin

  /** Streaming exact dedup (first event per (user_id, minute)) run to
    * completion — dropDuplicatesWithinWatermark emits each key once on
    * first arrival and evicts its state when the watermark passes, so
    * the emitted KEY SET equals the batch DISTINCT regardless of how the
    * input splits into micro-batches. Only the key columns are emitted
    * (which duplicate wins is arbitrary), which is exactly what makes
    * the streaming result deterministic and batch-comparable. Memory
    * sink (append); the query name is salted per run so bench re-runs in
    * one session never collide.
    */
  def st02StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_st02_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStream.dedupedEvents(EventStream.readEvents(s, dir))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name).orderBy(col("user_id"), col("minute"))
  }

  val st02Sql: String =
    """SELECT user_id, DATE_TRUNC('minute', ts) AS minute
      |FROM events GROUP BY 1, 2 ORDER BY user_id, minute""".stripMargin

  /** Stream-stream interval join run to completion — purchases matched
    * to the same user's clicks within the preceding hour, both sides
    * watermarked (EventStream.purchaseAfterClick: the bounded-state
    * join whose state store evicts rows older than the join window).
    * The batch oracle is the equivalent range join over raw events.
    *
    * Equivalence contract: the events data arrives as ONE parquet file,
    * so AvailableNow processes it as a single deterministic micro-batch
    * and no row can be watermark-late relative to another — the
    * streaming join emits exactly the batch join's pairs. (In an
    * unbounded deployment rows later than the watermark are DROPPED by
    * design; that divergence is the documented semantic of the
    * operator, not a bug this probe could hide.) Output keyed and
    * sorted on (p_id, c_id); p_value rides through unaggregated, so the
    * hash also audits that the join copies payload columns bit-for-bit.
    */
  def st03StreamJoin(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_st03_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStream.purchaseAfterClick(EventStream.readEvents(s, dir))
      .select(col("p_id"), col("c_id"), col("p_user"), col("p_value"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name).orderBy(col("p_id"), col("c_id"))
  }

  val st03Sql: String =
    """SELECT p.event_id AS p_id, c.event_id AS c_id,
      |  p.user_id AS p_user, p.value AS p_value
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND p.user_id = c.user_id
      |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
      |ORDER BY p_id, c_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_stream_hourly" -> (st01StreamHourly _),
    "st02_stream_dedup" -> (st02StreamDedup _),
    "st03_stream_join" -> (st03StreamJoin _))

  val oracle: Map[String, String] = Map(
    "st01_stream_hourly" -> st01Sql,
    "st02_stream_dedup" -> st02Sql,
    "st03_stream_join" -> st03Sql)
}
