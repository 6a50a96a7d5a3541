package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the TESTDATA star schema (TESTDATA.md) plus numeric helpers
  * that make aggregates bit-deterministic across engines.
  *
  * Scale note: each loader is a plain parquet scan, so Catalyst column
  * pruning and filter pushdown reach the file source (`PushedFilters` /
  * `ReadSchema` in .explain). At 100 TB these tables would be
  * partitioned/bucketed on their join keys; everything downstream only
  * assumes "a DataFrame with this schema", so swapping the loader for a
  * bucketed catalog table changes no query code.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The physical type of events.ts has drifted across testdata generations:
    * INT64 TIMESTAMP(NANOS) (surfaced as LongType nanos under
    * spark.sql.legacy.parquet.nanosAsLong), then parquet timestamp[us]
    * without UTC adjustment (surfaced as TIMESTAMP_NTZ). normalizeTs maps
    * every generation to the same session-TZ TIMESTAMP at microsecond
    * precision so downstream `unix_micros` / window / watermark code never
    * sees the physical layout.
    */
  def events(s: SparkSession, d: String): DataFrame = normalizeTs(table(s, d, "events"))

  /** Map any physical encoding of an event-time column to session-TZ
    * TIMESTAMP at microsecond precision:
    *  - LongType: nanos-in-int64 (legacy parquet TIMESTAMP(NANOS) read under
    *    nanosAsLong) — integer-divide to micros, the same truncation DuckDB
    *    applies casting timestamp_ns -> timestamp;
    *  - TIMESTAMP_NTZ: wall-clock micros — cast preserves the wall-clock
    *    field values under the UTC session TZ every graft session pins, so
    *    values agree with DuckDB's naive timestamp to the microsecond;
    *  - TIMESTAMP: already normalized.
    * Failing loudly on anything else beats silently computing 1970 dates.
    */
  def normalizeTs(df: DataFrame, name: String = "ts"): DataFrame =
    df.schema(name).dataType match {
      case LongType         => df.withColumn(name, tsFromNanos(col(name)))
      case TimestampNTZType => df.withColumn(name, col(name).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"unsupported physical type for event-time column `$name`: $other")
    }

  /** Nanos-long -> TimestampType conversion shared by the batch and
    * streaming events readers: INTEGER-divide to micros (double division
    * would lose precision — nanos exceed 2^53) — the same truncation
    * DuckDB applies casting timestamp_ns -> timestamp. Takes a simple
    * column reference (the name is spliced into a SQL `div`). */
  def tsFromNanos(c: Column): Column = expr(s"timestamp_micros(${c.toString} div 1000)")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Shared text canonicalization for the dedup/fingerprint family:
    * lowercase, then one regex pass collapsing every maximal run of
    * non-alphanumerics to a single space, trimmed. All operators that
    * compare or hash canonical text (d01, d03/d04 shingles, p01/p02
    * fingerprints, t04) MUST use this one definition — fingerprint
    * compatibility across operators depends on it.
    */
  def canonText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Spread a small scan across the cluster before compute-heavy map work.
    *
    * Single-file parquet with one row group plans as ONE input partition,
    * so everything before the first exchange (regex canonicalization,
    * shingling, hashing, per-row vector math) runs in a single task no
    * matter how many cores exist. This helper round-robins such inputs to
    * defaultParallelism — and is a deliberate NO-OP when the scan already
    * has enough partitions, which is exactly the 100 TB case (thousands
    * of files): the repartition exists to parallelize pathologically
    * small inputs, never to add a shuffle at scale.
    *
    * Only use BELOW compute-heavy map phases; never between a filter and
    * its scan (a user repartition blocks predicate pushdown).
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // file count approximates scan parallelism without df.rdd's throwaway
    // physical planning (the listing is already cached by the FileIndex);
    // a single huge multi-row-group file would repartition unnecessarily,
    // an acceptable trade for a helper aimed at pathologically small inputs
    if (df.inputFiles.length < math.max(2, p / 2)) df.repartition(p) else df
  }

  /** Exact decimal sum of a double column, returned as double.
    *
    * Why: a straight `sum(double)` depends on partition/row order, so two
    * engines (or two runs) can disagree in the last bits. Monetary columns in
    * TESTDATA carry <= `scale` decimal digits, so the per-row cast to
    * DECIMAL is exact, the decimal sum is order-independent, and the final
    * cast back to double is a single deterministic conversion. This is also
    * the right call at 100 TB: decimal sums stay inside whole-stage codegen
    * and partial aggregation (map-side combine) still applies.
    */
  def dsum(c: Column, precision: Int = 30, scale: Int = 6): Column =
    sum(c.cast(DecimalType(precision, scale))).cast(DoubleType)

  /** Order-independent average of a double column: exact decimal sum divided
    * by the count, both deterministic, division done once in double space.
    */
  def davg(c: Column, precision: Int = 30, scale: Int = 6): Column =
    (sum(c.cast(DecimalType(precision, scale))).cast(DoubleType) / count(c))
}
