package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the `documents` corpus — continuous-ingestion
  * twins of the batch dedup tier (d01 exact fingerprints, p02's
  * incremental keep-first semantics).
  *
  * The deployment story this models: document files land in a directory
  * continuously (crawl output, upload batches); the stream canonicalizes
  * and fingerprints each arrival, keeps only content never seen before,
  * and maintains per-source corpus counters. The same
  * [[graft.Tables.canonText]] + md5 fingerprint as the batch tier, so a
  * document deduplicated here is exactly the document d01/p02 would drop.
  *
  * State note: exact corpus-lifetime dedup means the state store holds one
  * 16-byte hash per distinct content FOREVER — that is the semantics, not
  * a leak (RocksDB state store + changelog checkpointing at scale; ~1.6 TB
  * of state per 100 G distinct documents, spread across executors). When
  * re-ingestion duplicates only arrive within a bounded horizon,
  * `dropDuplicatesWithinWatermark` (EventStream.dedupedEvents) bounds the
  * state instead; when history lives in a static table, the batch
  * anti-join (p02/p03) is the cheaper shape.
  */
object CorpusStream {

  private[graft] val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Unbounded read of the documents data; the trailing glob keeps
    * FileStreamSource's basePath at the directory level (same trick as
    * EventStream.readEvents) so production can point at an arrival
    * directory.
    */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .parquet(s"$dir/documents.parque[t]")

  /** First-arrival-wins exact dedup, scoped per source: one surviving row
    * per (source, canonical fingerprint). Scoping the key to the source
    * makes the surviving SET (and thus every downstream count)
    * arrival-order-independent — a corpus-GLOBAL key would let a
    * cross-source duplicate land on whichever source ingested it first,
    * an inherent race; which doc_id survives within a source is still
    * arrival order, so consumers key on (source, h), never doc_id.
    */
  def dedupedCorpus(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("doc_id"),
        md5(graft.Tables.canonText(col("text"))).as("h"))
      .dropDuplicates("source", "h")

  /** Per-source corpus counters over the deduped stream — the live
    * "distinct contents ingested per source" dashboard feed.
    */
  def sourceCounters(docs: DataFrame): DataFrame =
    dedupedCorpus(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct"))

  /** Run the counters to completion over the bounded input (memory sink,
    * complete mode) and return the static result.
    */
  def runBounded(spark: SparkSession, dir: String, queryName: String = "graft_corpus_dedup"): DataFrame = {
    val q = sourceCounters(readDocuments(spark, dir))
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
