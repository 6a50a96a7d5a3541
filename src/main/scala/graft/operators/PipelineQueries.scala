package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Composed end-to-end data-pipeline queries: the individual operators
  * (quality scoring, fingerprint dedup, token stats) chained the way a
  * training-data pipeline actually runs them. Demonstrates that the
  * operator tier composes into one Catalyst plan — the filter, the
  * canonicalization, the dedup shuffle, and the final stats are a single
  * optimized query, not four materialized passes.
  */
object PipelineQueries {

  /** Clean-corpus pass: quality-filter documents, dedup by canonical
    * fingerprint (keep the lowest doc_id), report per-source survivors and
    * volume. One shuffle for the dedup, one for the final rollup.
    */
  def p01CleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.spread(Tables.documents(s, dir))
      .withColumn("n_tokens",
        expr("size(regexp_extract_all(text, '[A-Za-z0-9]+', 0))").cast(DoubleType))
      .withColumn("len_score", least(lit(1.0), length(col("text")).cast(DoubleType) / lit(500.0)))
      .filter(col("n_tokens") >= 10 && col("len_score") >= 0.2)
      .withColumn("canon",
        Tables.canonText(col("text")))
      .withColumn("fp", md5(col("canon")))
    val keepers = scored
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
    keepers.join(scored, Seq("fp", "doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens").cast(LongType)).as("total_tokens"))
      .orderBy(col("source"))
  }

  val p01Sql: String =
    """WITH scored AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS DOUBLE) AS n_tokens,
      |    LEAST(1.0, CAST(LENGTH(text) AS DOUBLE) / 500.0) AS len_score,
      |    md5(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
      |  FROM documents),
      |filtered AS (
      |  SELECT * FROM scored WHERE n_tokens >= 10 AND len_score >= 0.2),
      |keepers AS (
      |  SELECT fp, MIN(doc_id) AS doc_id FROM filtered GROUP BY fp)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
      |FROM keepers JOIN filtered USING (fp, doc_id)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Incremental (cross-batch) dedup — the shape every recurring training
    * crawl runs: a new batch (sources src0/src1) is deduped AGAINST the
    * accumulated history (every other source) by canonical fingerprint,
    * then within itself (keep lowest doc_id). The anti join ships only
    * 16-byte hashes; at 100 TB the history side is a bucketed fingerprint
    * table, so the anti join is co-located and the new batch never
    * re-reads historical text.
    */
  /** Shared stages of the p02/p03 pair (they must stay bit-identical —
    * the bloom variant shares p02's oracle and an equality spec, so the
    * only difference between them is how the anti-join input is gated). */
  private val isNewBatch: Column = col("source").isin("src0", "src1")

  private def fingerprinted(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .withColumn("fp", md5(Tables.canonText(col("text"))))

  /** survivors (fp, keeper_doc_id, n_in_batch) → per-source keeper report. */
  private def keeperReport(survivors: DataFrame, docs: DataFrame): DataFrame = {
    val fresh = survivors
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_in_batch"))
    fresh
      .join(docs.select(col("doc_id").as("keeper_doc_id"), col("source"), col("n_chars")),
        Seq("keeper_doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_in_batch")).as("n_batch_copies"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("source"))
  }

  def p02IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = fingerprinted(s, dir)
    val history = docs.filter(!isNewBatch).select(col("fp"))
    keeperReport(docs.filter(isNewBatch).join(history, Seq("fp"), "left_anti"), docs)
  }

  val p02Sql: String =
    """WITH fps AS (
      |  SELECT doc_id, source, n_chars,
      |    md5(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
      |  FROM documents),
      |fresh AS (
      |  SELECT fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_in_batch
      |  FROM fps b
      |  WHERE source IN ('src0', 'src1') AND NOT EXISTS (
      |    SELECT 1 FROM fps h WHERE h.source NOT IN ('src0', 'src1') AND h.fp = b.fp)
      |  GROUP BY fp)
      |SELECT source, COUNT(*) AS n_kept,
      |  CAST(SUM(n_in_batch) AS BIGINT) AS n_batch_copies,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM fresh JOIN fps ON keeper_doc_id = doc_id
      |GROUP BY source ORDER BY source""".stripMargin

  /** p02 with a Bloom pre-filter — the 100 TB shape of incremental dedup.
    * The history side is summarized into a Bloom filter (built with the
    * distributed `df.stat.bloomFilter` aggregate — ~10 bits/key at 1% fpp,
    * so a billion-doc history is ~1.2 GB, broadcastable) and the new batch
    * is split WITHOUT a shuffle:
    *
    *  - bloom says "absent"  → definitely new; skips the anti-join
    *    entirely (no false negatives);
    *  - bloom says "present" → maybe-duplicate (1% of the batch are false
    *    positives); only THIS sliver pays the exact anti-join against
    *    history.
    *
    * The join input shrinks from |batch| to |true dups| + fpp·|batch|,
    * which is the difference between shuffling the whole crawl and
    * shuffling ~nothing when most of a recrawl is genuinely new. Output is
    * bit-identical to p02 (the exact path catches every bloom false
    * positive); the oracle pins that equivalence.
    *
    * The membership probe is a broadcast-closure predicate (Spark exposes
    * no public Column API over `util.sketch.BloomFilter`); it gates only
    * the join input, so the scan/filter pushdown path is unaffected.
    */
  def p03BloomIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = fingerprinted(s, dir)
    val history = docs.filter(!isNewBatch).select(col("fp")).cache()
    val bloom = history.stat.bloomFilter("fp", 100000L, 0.01)
    val bloomB = s.sparkContext.broadcast(bloom)
    // null fp (null text upstream) = "absent": the sketch can't hold it
    // and the exact anti-join treats null as matching nothing, so routing
    // nulls down the definitely-new path preserves p02's semantics
    // (a bare mightContainString(null) would NPE)
    val mightContain = udf((fp: String) => fp != null && bloomB.value.mightContainString(fp))
    val batch = docs.filter(isNewBatch).cache()
    val definitelyNew = batch.filter(!mightContain(col("fp")))
    val maybeDup = batch.filter(mightContain(col("fp")))
      .join(history, Seq("fp"), "left_anti")
    keeperReport(definitelyNew.unionByName(maybeDup), docs)
  }

  /** Sequence packing — the last hop before the trainer: documents are
    * concatenated in a deterministic order (per source, by doc_id) and
    * chopped into fixed 512-token training windows ("concat-and-chop",
    * the standard GPT-style packing). Each document reports the window
    * it starts in and whether it straddles a window boundary (the
    * fraction of straddlers is the attention-contamination metric packing
    * studies trade off against padding waste).
    *
    * Scale shape: a running sum partitioned only by source would pack a
    * 10 TB crawl in ONE task, so the prefix sum is computed at two
    * levels — the classic distributed scan:
    *
    *   1. docs are bucketed by doc_id range WITHIN source (bucket order
    *      = doc order, so concatenation order is unchanged);
    *   2. within-bucket exclusive running sums run in parallel across
    *      (source, bucket) partitions;
    *   3. per-bucket totals (one row per bucket — tiny) get their own
    *      exclusive running sum per source, giving each bucket's global
    *      starting offset;
    *   4. a join on (source, bucket) adds the two.
    *
    * Identical output to the single-window formulation (the oracle pins
    * it), but the heavy scan parallelizes to any bucket granularity; a
    * production writer would follow with repartitionByRange(bin_id) to
    * emit one file per window range.
    */
  def p04SequencePacking(s: SparkSession, dir: String): DataFrame = {
    val cap = 512
    val W = org.apache.spark.sql.expressions.Window
    val withinBucket = W.partitionBy(col("source"), col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val acrossBuckets = W.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, -1)
    // cache the tokenized narrow frame (no text column): the window
    // branch and the bucket-totals branch both consume it, and uncached
    // the regex tokenization pass over every document runs twice
    val counted = Tables.spread(Tables.documents(s, dir))
      .withColumn("n_tokens",
        expr("size(regexp_extract_all(text, '[A-Za-z0-9]+', 0))").cast(LongType))
      .withColumn("bucket", expr("doc_id div 1000"))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("bucket"))
      .cache()
    counted.count()
    val toks = counted
      .withColumn("within_off", coalesce(sum(col("n_tokens")).over(withinBucket), lit(0L)))
    val bucketOffs = counted.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_total"))
      .withColumn("bucket_off", coalesce(sum(col("bucket_total")).over(acrossBuckets), lit(0L)))
      .select(col("source"), col("bucket"), col("bucket_off"))
    toks.join(bucketOffs, Seq("source", "bucket"))
      .withColumn("start_off", col("bucket_off") + col("within_off"))
      .withColumn("bin_id", expr(s"start_off div $cap"))
      .withColumn("spans_boundary",
        col("n_tokens") > 0 && expr(s"(start_off + n_tokens - 1) div $cap") =!= col("bin_id"))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("start_off"),
        col("bin_id"), col("spans_boundary"))
      .orderBy(col("source"), col("doc_id"))
  }

  val p04Sql: String =
    """WITH toks AS (
      |  SELECT source, doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |offs AS (
      |  SELECT source, doc_id, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
      |  FROM toks)
      |SELECT source, doc_id, n_tokens, start_off,
      |  start_off // 512 AS bin_id,
      |  (n_tokens > 0 AND (start_off + n_tokens - 1) // 512 <> start_off // 512)
      |    AS spans_boundary
      |FROM offs ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------- p05
  /** Training-mixture construction — the sampling stage that turns a
    * cleaned corpus into a training mix with per-source weights (e.g.
    * up-weight curated sources, down-weight crawl): each source gets a
    * target rate, and documents are kept by DETERMINISTIC hash sampling
    * (first md5 hex digit of doc_id against the rate's hex threshold —
    * the q30 pattern), so the sample is reproducible run-to-run, stable
    * under re-partitioning, and needs no RNG state. Rates here are
    * assigned by source index mod 4 -> {1, 1/2, 1/4, 1/8}; hex-prefix
    * thresholds make each rate EXACT over the hash space.
    *
    * Output is the mixture report a pipeline operator would log: docs and
    * token volume kept per source, achieved vs target rate. One map pass
    * + one rollup shuffle on source; at 100 TB the filter rides the scan
    * and only survivors' token counts flow into the aggregate.
    */
  def p05MixtureSample(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .withColumn("m", expr("cast(substring(source, 4) as int) % 4"))
      .withColumn("target_rate",
        when(col("m") === 0, 1.0).when(col("m") === 1, 0.5)
          .when(col("m") === 2, 0.25).otherwise(0.125))
      .withColumn("hx", substring(md5(col("doc_id").cast(StringType)), 1, 1))
      .withColumn("kept",
        when(col("m") === 0, lit(true))
          .when(col("m") === 1, col("hx") < "8")
          .when(col("m") === 2, col("hx") < "4")
          .otherwise(col("hx") < "2"))
      .withColumn("n_toks",
        size(split(Tables.canonText(col("text")), " ")).cast(LongType))
      .groupBy(col("source"), col("target_rate"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("kept"), col("n_toks")).otherwise(0L)).as("sampled_tokens"))
      .withColumn("achieved_rate",
        floor(col("n_sampled").cast(DoubleType) / col("n_docs") * 10000.0 + 0.5) / 10000.0)
      .orderBy(col("source"))

  val p05Sql: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(substring(source, 4) AS INT) % 4 AS m,
      |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS hx,
      |    CAST(len(string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |t AS (
      |  SELECT source,
      |    CAST(CASE m WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25 ELSE 0.125 END AS DOUBLE) AS target_rate,
      |    (m = 0 OR (m = 1 AND hx < '8') OR (m = 2 AND hx < '4') OR (m = 3 AND hx < '2')) AS kept,
      |    n_toks
      |  FROM d)
      |SELECT source, target_rate, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN kept THEN n_toks ELSE 0 END) AS BIGINT) AS sampled_tokens,
      |  FLOOR(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS achieved_rate
      |FROM t GROUP BY 1, 2 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p06
  /** Per-domain document cap — the anti-over-representation rule every
    * web-scale mixture applies (no single domain may contribute more than
    * K documents): rank each source's documents by a deterministic
    * content-free hash (md5 of the id, so the survivor set is a uniform
    * random-but-reproducible sample, not a scan-order artifact) and keep
    * the first K. Output is the per-source audit row: volume before/after
    * and the survivor id-sum as a set fingerprint.
    *
    * Plan: one shuffle on source for the window, one rollup. The
    * ROW_NUMBER window is the semantics contract; at 100 TB a mega-domain
    * (single source holding a double-digit share of the corpus) makes one
    * window partition a straggler, and the fix is bounded partial top-K —
    * the [[graft.functions.GraftTopK]] aggregate q55 runs keeps only K
    * rows of state per group ON THE MAP SIDE, turning the skewed sort
    * into a merge of K-element buffers. (Kept as the window form here
    * because the hash rank key is a string; GraftTopK orders by a numeric
    * key.)
    */
  def p06DomainCap(s: SparkSession, dir: String): DataFrame = {
    val cap = 10
    val w = Window.partitionBy(col("source")).orderBy(col("hx"), col("doc_id"))
    Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast(StringType)).as("hx"))
      .withColumn("kept", row_number().over(w) <= cap)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("doc_id"))).as("kept_id_sum"))
      .orderBy(col("source"))
  }

  val p06Sql: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 10 AS kept
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN kept THEN doc_id END) AS BIGINT) AS kept_id_sum
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p07
  /** Overlapping document chunking — the context-window shaping step of a
    * training / RAG pipeline: each document becomes chunks of
    * [[ChunkW]] canonical words advancing by [[ChunkStride]] (so
    * consecutive chunks share ChunkW - ChunkStride words of context, and
    * no split point ever loses cross-boundary tokens). Chunk starts are
    * i*stride for i*stride < n_words; trailing chunks may be shorter.
    *
    * Unlike p04 (which PACKS whole docs into fixed token budgets), this
    * SPLITS single docs; a real pipeline runs p07 then p04. Scale shape:
    * pure per-row map + Generate (posexplode) — zero shuffles beyond the
    * presentation orderBy, so it pipelines inside one whole-stage-codegen
    * pass at any corpus size, and output bytes = input bytes * (W/stride)
    * overhead, chosen here as 4/3.
    */
  private val ChunkW = 16
  private val ChunkStride = 12

  def p07ChunkOverlap(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), split(Tables.canonText(col("text")), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, cast(ceil(size(w) / ${ChunkStride}.0) as int) - 1),
           |          i -> struct(array_join(slice(w, i * $ChunkStride + 1, $ChunkW), ' ') AS txt,
           |                      size(slice(w, i * $ChunkStride + 1, $ChunkW)) AS nw))""".stripMargin)))
      .select(
        col("doc_id"),
        col("pos").cast(LongType).as("chunk_id"),
        col("col.txt").as("chunk_text"),
        col("col.nw").cast(LongType).as("n_words"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val p07Sql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS ws
      |  FROM documents)
      |SELECT doc_id, i AS chunk_id,
      |  array_to_string(ws[i*12+1 : i*12+16], ' ') AS chunk_text,
      |  CAST(len(ws[i*12+1 : i*12+16]) AS BIGINT) AS n_words
      |FROM docs, unnest(generate_series(0, CAST(CEIL(len(ws) / 12.0) AS INT) - 1)) AS u(i)
      |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------- p08
  /** Chunk-then-pack — the composed shape a real pretraining pipeline
    * runs: p07's overlapping chunks become the packing units, and each
    * source's chunk stream is packed into fixed 64-word training bins
    * with p04's two-level distributed prefix sum (within-bucket window +
    * one-row-per-bucket offsets — NOT one giant window per source, so a
    * hot source still parallelizes). Composition is literal: the chunk
    * frame IS [[p07ChunkOverlap]]'s output joined to each doc's source —
    * operators compose as DataFrames, no re-implementation.
    *
    * Output: one row per chunk with its global start offset, bin id, and
    * whether it straddles a bin boundary (a training loader would split
    * or pad there). Deterministic: integer word counts, total ordering
    * by (source, doc_id, chunk_id).
    */
  def p08ChunkPack(s: SparkSession, dir: String): DataFrame = {
    val cap = 64
    val W = org.apache.spark.sql.expressions.Window
    val withinBucket = W.partitionBy(col("source"), col("bucket"))
      .orderBy(col("doc_id"), col("chunk_id")).rowsBetween(W.unboundedPreceding, -1)
    val acrossBuckets = W.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, -1)
    // narrow frame: ids + counts only; cached because the window branch
    // and the bucket-totals branch both consume it (p04's rationale)
    val chunks = p07ChunkOverlap(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("bucket", expr("doc_id div 1000"))
      .select(col("source"), col("doc_id"), col("chunk_id"), col("n_words"), col("bucket"))
      .cache()
    chunks.count()
    val within = chunks
      .withColumn("within_off", coalesce(sum(col("n_words")).over(withinBucket), lit(0L)))
    val bucketOffs = chunks.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_words")).as("bucket_total"))
      .withColumn("bucket_off", coalesce(sum(col("bucket_total")).over(acrossBuckets), lit(0L)))
      .select(col("source"), col("bucket"), col("bucket_off"))
    within.join(bucketOffs, Seq("source", "bucket"))
      .withColumn("start_off", col("bucket_off") + col("within_off"))
      .withColumn("bin_id", expr(s"start_off div $cap"))
      .withColumn("spans_boundary",
        col("n_words") > 0 && expr(s"(start_off + n_words - 1) div $cap") =!= col("bin_id"))
      .select(col("source"), col("doc_id"), col("chunk_id"), col("n_words"),
        col("start_off"), col("bin_id"), col("spans_boundary"))
      .orderBy(col("source"), col("doc_id"), col("chunk_id"))
  }

  val p08Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, source,
      |    string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS ws
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, i AS chunk_id,
      |    CAST(len(ws[i*12+1 : i*12+16]) AS BIGINT) AS n_words
      |  FROM docs, unnest(generate_series(0, CAST(CEIL(len(ws) / 12.0) AS INT) - 1)) AS u(i)),
      |offs AS (
      |  SELECT source, doc_id, chunk_id, n_words,
      |    CAST(COALESCE(SUM(n_words) OVER (PARTITION BY source ORDER BY doc_id, chunk_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
      |  FROM c)
      |SELECT source, doc_id, chunk_id, n_words, start_off,
      |  start_off // 64 AS bin_id,
      |  (n_words > 0 AND (start_off + n_words - 1) // 64 <> start_off // 64) AS spans_boundary
      |FROM offs ORDER BY source, doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------- p09
  /** Corpus snapshot diff — the dataset-versioning delta report: given
    * two corpus versions, classify every document as added / removed /
    * changed / same by comparing canonical-content fingerprints under the
    * stable doc identity, and roll the counts up per source (what a
    * dataset card's "changes since v1" table holds). Versions here are
    * derived deterministically from the one shipped table so the oracle
    * can rebuild both: OLD = docs with doc_id % 10 != 0 (and for
    * doc_id % 5 == 0 the text truncated to its first 40 chars — a
    * "content edit"); NEW = docs with doc_id % 10 != 3 with true text.
    * So %10==0 rows are added, %10==3 removed, %10==5 changed.
    *
    * Scale shape: fingerprints are 16-byte md5s computed map-side on each
    * scan; the FULL OUTER join ships (doc_id, source, hash) — never text
    * — and the per-source rollup is a counting aggregate. Version scans
    * are independent, so at 100 TB this is two parquet snapshots joined
    * on their id column, the cheapest possible diff.
    */
  def p09SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    def fp(df: DataFrame): DataFrame =
      df.select(col("doc_id"), col("source"),
        md5(Tables.canonText(col("text"))).as("h"))
    val docs = Tables.spread(Tables.documents(s, dir))
    val old = fp(docs.filter(col("doc_id") % 10 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, substring(col("text"), 1, 40)).otherwise(col("text"))))
      .select(col("doc_id").as("o_id"), col("source").as("o_src"), col("h").as("o_h"))
    val neu = fp(docs.filter(col("doc_id") % 10 =!= 3))
    neu.join(old, col("doc_id") === col("o_id"), "full_outer")
      .select(
        coalesce(col("source"), col("o_src")).as("src"),
        when(col("o_id").isNull, "added")
          .when(col("doc_id").isNull, "removed")
          .when(col("h") =!= col("o_h"), "changed")
          .otherwise("same").as("status"))
      .groupBy(col("src"))
      .agg(
        count(when(col("status") === "added", 1)).as("n_added"),
        count(when(col("status") === "removed", 1)).as("n_removed"),
        count(when(col("status") === "changed", 1)).as("n_changed"),
        count(when(col("status") === "same", 1)).as("n_same"))
      .orderBy(col("src"))
  }

  val p09Sql: String =
    """WITH canon AS (
      |  SELECT doc_id, source, text FROM documents),
      |old AS (
      |  SELECT doc_id, source,
      |    md5(TRIM(regexp_replace(regexp_replace(LOWER(
      |      CASE WHEN doc_id % 5 = 0 THEN substr(text, 1, 40) ELSE text END),
      |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
      |  FROM canon WHERE doc_id % 10 <> 0),
      |neu AS (
      |  SELECT doc_id, source,
      |    md5(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
      |  FROM canon WHERE doc_id % 10 <> 3),
      |d AS (
      |  SELECT COALESCE(n.source, o.source) AS src,
      |    CASE WHEN o.doc_id IS NULL THEN 'added'
      |         WHEN n.doc_id IS NULL THEN 'removed'
      |         WHEN n.h <> o.h THEN 'changed'
      |         ELSE 'same' END AS status
      |  FROM neu n FULL OUTER JOIN old o ON n.doc_id = o.doc_id)
      |SELECT src,
      |  COUNT(*) FILTER (WHERE status = 'added') AS n_added,
      |  COUNT(*) FILTER (WHERE status = 'removed') AS n_removed,
      |  COUNT(*) FILTER (WHERE status = 'changed') AS n_changed,
      |  COUNT(*) FILTER (WHERE status = 'same') AS n_same
      |FROM d GROUP BY src ORDER BY src""".stripMargin

  // ---------------------------------------------------------------- p10
  /** Token-budgeted mixture — the THIRD cap variant in the sampling
    * toolkit (p05 samples by RATE, p06 caps DOC COUNT, p10 caps TOKEN
    * volume): each source gets a token budget, documents are taken in
    * deterministic hash order (md5 of the id — reproducible, content-free,
    * partition-order-independent), and a document is kept while the
    * EXCLUSIVE prefix of token counts is still under budget — so the
    * first document that crosses the line is the last one in (standard
    * "fill until full" semantics; budgets are soft by at most one doc).
    *
    * Mixture weights in real pipelines are TOKEN weights, not doc
    * weights — this is the operator that actually enforces them. Budgets
    * here derive from the source index (mod 3 → {2000, 8000, 32000}
    * tokens) so the oracle can rebuild them.
    *
    * Scale shape: one window per source over (hash, id) order carrying an
    * 8-byte running sum. A mega-source makes that window a straggler; the
    * fix is p04's two-level prefix sum over hash-range buckets (identical
    * output, any parallelism). Kept single-window here because the
    * semantics contract — exclusive prefix < budget — is the thing the
    * oracle pins, and the two-level rewrite is already proven in p04/p08.
    */
  def p10TokenBudget(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("hx"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.spread(Tables.documents(s, dir))
      .withColumn("n_toks",
        expr("size(regexp_extract_all(text, '[A-Za-z0-9]+', 0))").cast(LongType))
      .withColumn("budget",
        expr("cast(pow(4, cast(substring(source, 4) as int) % 3) as bigint) * 2000"))
      .withColumn("hx", md5(col("doc_id").cast(StringType)))
      .withColumn("taken_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("kept", col("taken_before") < col("budget"))
      .groupBy(col("source"), col("budget"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_toks")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  val p10Sql: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_toks,
      |    CAST(POW(4, CAST(substring(source, 4) AS INT) % 3) AS BIGINT) * 2000 AS budget,
      |    md5(CAST(doc_id AS VARCHAR)) AS hx
      |  FROM documents),
      |o AS (
      |  SELECT source, budget, n_toks,
      |    CAST(COALESCE(SUM(n_toks) OVER (PARTITION BY source ORDER BY hx, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) < budget AS kept
      |  FROM d)
      |SELECT source, budget, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN kept THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM o GROUP BY 1, 2 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p11
  /** Epoch upsampling — mixture weights ABOVE 1.0: a curated source with
    * weight w contributes floor(w) full passes ("epochs") plus a
    * fractional epoch holding a deterministic hash-sampled w - floor(w)
    * of its documents (the DoReMi/Pile recipe for up-weighting small
    * high-quality sources against a huge crawl). p05 can only THIN a
    * source; this REPEATS it — together they implement any positive
    * weight.
    *
    * The repeat is a Generate (posexplode of a sequence built per row):
    * pure map-side fan-out, no shuffle, no join — output volume is
    * exactly sum(w_s * |s|), the same bytes the trainer will read, so
    * nothing is amplified beyond the intended mix. Each emitted row
    * carries its epoch index (trainers shuffle on (epoch, hash) so
    * repeats land in different batches). Weights derive from the source
    * index (mod 4 → {0.5, 1.0, 1.5, 2.5}); the fractional-epoch keep
    * rule reuses p05's exact hex-threshold trick (hash digit < 8 = rate
    * 1/2), so every stage is reproducible in the oracle.
    */
  def p11UpsampleEpochs(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .withColumn("m", expr("cast(substring(source, 4) as int) % 4"))
      .withColumn("weight",
        when(col("m") === 0, 0.5).when(col("m") === 1, 1.0)
          .when(col("m") === 2, 1.5).otherwise(2.5))
      .withColumn("n_toks",
        expr("size(regexp_extract_all(text, '[A-Za-z0-9]+', 0))").cast(LongType))
      .withColumn("in_frac",
        substring(md5(col("doc_id").cast(StringType)), 1, 1) < lit("8"))
      // epochs 0..floor(w)-1 are full; epoch floor(w) exists only for the
      // fractional remainder and keeps the hash-sampled half (all our
      // fractional parts are .5, so one hex-digit threshold is exact)
      .withColumn("n_full", floor(col("weight")).cast(IntegerType))
      .withColumn("epoch", explode(expr(
        """filter(sequence(0, n_full),
          |       e -> e < n_full OR (weight > n_full AND in_frac))""".stripMargin)))
      .groupBy(col("source"), col("weight"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_emitted"),
        sum(col("n_toks")).as("emitted_tokens"),
        max(col("epoch")).as("max_epoch"))
      .orderBy(col("source"))

  val p11Sql: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(substring(source, 4) AS INT) % 4 AS m,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_toks,
      |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS in_frac
      |  FROM documents),
      |w AS (
      |  SELECT source, doc_id, n_toks, in_frac,
      |    CAST(CASE m WHEN 0 THEN 0.5 WHEN 1 THEN 1.0 WHEN 2 THEN 1.5 ELSE 2.5 END AS DOUBLE) AS weight,
      |    CAST(FLOOR(CASE m WHEN 0 THEN 0.5 WHEN 1 THEN 1.0 WHEN 2 THEN 1.5 ELSE 2.5 END) AS INT) AS n_full
      |  FROM d),
      |e AS (
      |  SELECT source, weight, doc_id, n_toks, CAST(epoch AS INT) AS epoch
      |  FROM w, unnest(generate_series(0, n_full)) AS u(epoch)
      |  WHERE epoch < n_full OR (weight > n_full AND in_frac))
      |SELECT source, weight, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_emitted,
      |  CAST(SUM(n_toks) AS BIGINT) AS emitted_tokens,
      |  MAX(epoch) AS max_epoch
      |FROM e GROUP BY 1, 2 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p12
  /** Leakage-safe train/val/test split — the assignment unit is the
    * DUPLICATE CLUSTER (d06's connected component over verified near-dup
    * pairs; singleton docs are their own cluster), not the document.
    * Splitting per-document leaks: a near-duplicate of a validation
    * document lands in train and the eval overestimates generalization.
    * Hashing the CLUSTER id makes every member of a component land in
    * the same split by construction.
    *
    * Split rule: first two hex chars of md5(cluster_id) — < 'cd' (204/256
    * ~= 79.7%) train, < 'e6' (230/256, next ~10.2%) val, else test. The
    * same deterministic-hash-threshold discipline as p05's mixture
    * sampler, so the split is reproducible across engines, runs, and
    * corpus growth (a cluster keeps its split when new data arrives).
    *
    * Output: per-split doc/cluster volumes plus the leakage audit — the
    * count of clusters straddling >1 split, which the hash construction
    * pins to 0 (the audit column exists to PROVE it on real output, the
    * way a production pipeline would gate promotion).
    *
    * Scale shape: cluster resolution is d06's bounded iteration; the
    * split itself adds one map pass (md5 of an 8-byte key) and a
    * cluster-keyed size join — no new corpus-sized shuffle. The audit is
    * a cluster-keyed aggregate, and its 1-row result joins back via
    * broadcast (t09's no-collect pattern).
    */
  def p12LeakageSplit(s: SparkSession, dir: String): DataFrame = {
    val assigned = DedupQueries.clusterAssignment(s, dir)
      .withColumn("hx", substring(md5(col("cluster_id").cast(StringType)), 1, 2))
      .withColumn("split",
        when(col("hx") < "cd", "train").when(col("hx") < "e6", "val").otherwise("test"))
      .cache() // three readers: cluster sizes, the leakage audit, the rollup
    try {
      assigned.count()
      val sizes = assigned.groupBy(col("cluster_id")).agg(count(lit(1)).as("csize"))
      val leaky = assigned.groupBy(col("cluster_id"))
        .agg(countDistinct(col("split")).as("ns"))
        .filter(col("ns") > 1)
        .agg(count(lit(1)).as("leaky_clusters"))
      assigned.join(sizes, "cluster_id")
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum(when(col("csize") > 1, 1L).otherwise(0L)).as("n_docs_in_multi"))
        .crossJoin(broadcast(leaky))
        .orderBy(col("split"))
        .localCheckpoint() // materialize before the cache below is released
    } finally {
      assigned.unpersist()
    }
  }

  /** d06's recursive-CTE component derivation (shared text, so the
    * cluster definition cannot drift between the two oracles) + the
    * hash-threshold split restated over it. */
  val p12Sql: String = DedupQueries.d06Ctes +
    """,
      |assigned AS (
      |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      |  FROM documents d LEFT JOIN comp c USING (doc_id)),
      |sp AS (
      |  SELECT doc_id, cluster_id,
      |    CASE WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
      |         WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM assigned),
      |sizes AS (SELECT cluster_id, COUNT(*) AS csize FROM sp GROUP BY 1),
      |leak AS (
      |  SELECT COUNT(*) AS leaky_clusters FROM (
      |    SELECT cluster_id FROM sp GROUP BY cluster_id HAVING COUNT(DISTINCT split) > 1))
      |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT s.cluster_id) AS n_clusters,
      |  CAST(SUM(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_in_multi,
      |  leaky_clusters
      |FROM sp s JOIN sizes z USING (cluster_id) CROSS JOIN leak
      |GROUP BY split, leaky_clusters ORDER BY split""".stripMargin

  // ---------------------------------------------------------------- p13
  /** Curated-corpus composition — the round-5 signals chained the way a
    * pretraining pipeline gates a shard: a document survives iff it
    * passes t13's composite quality gate AND d13's span-dedup keep rule
    * (< 30% of its tokens inside cross-document repeated 8-token spans).
    * The rollup attributes every drop to quality-only / span-only / both
    * — the triage view a curation run reports per source.
    *
    * Composition is BY REFERENCE: the Spark side calls the two public
    * operators and joins their outputs (doc_id-keyed), and the oracle
    * embeds the SAME t13Sql/d13Sql texts as nested CTE bodies — the gate
    * definitions cannot drift from their standalone, separately-oracled
    * forms. Scale: both inputs end doc_id-keyed, so the join adds no new
    * corpus-wide shuffle beyond what its components already pay.
    */
  def p13CuratedCorpus(s: SparkSession, dir: String): DataFrame = {
    val quality = TextQueries.t13QualityGate(s, dir).select(col("doc_id"), col("passes"))
    val spans = DedupQueries.d13SpanDedup(s, dir)
      .select(col("doc_id"), col("keep"), col("n_toks"))
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    src.join(quality, "doc_id").join(spans, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("passes") && col("keep"), 1L).otherwise(0L)).as("n_survivors"),
        sum(when(col("passes") && col("keep"), col("n_toks")).otherwise(0L)).as("survivor_tokens"),
        sum(when(!col("passes") && col("keep"), 1L).otherwise(0L)).as("fail_quality_only"),
        sum(when(col("passes") && !col("keep"), 1L).otherwise(0L)).as("fail_span_only"),
        sum(when(!col("passes") && !col("keep"), 1L).otherwise(0L)).as("fail_both"))
      .orderBy(col("source"))
  }

  val p13Sql: String =
    s"""WITH q AS (
       |${TextQueries.t13Sql}
       |),
       |sd AS (
       |${DedupQueries.d13Sql}
       |),
       |src AS (SELECT doc_id, source FROM documents)
       |SELECT source,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN passes AND keep THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       |  CAST(SUM(CASE WHEN passes AND keep THEN sd.n_toks ELSE 0 END) AS BIGINT) AS survivor_tokens,
       |  CAST(SUM(CASE WHEN NOT passes AND keep THEN 1 ELSE 0 END) AS BIGINT) AS fail_quality_only,
       |  CAST(SUM(CASE WHEN passes AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS fail_span_only,
       |  CAST(SUM(CASE WHEN NOT passes AND NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS fail_both
       |FROM src JOIN q USING (doc_id) JOIN sd USING (doc_id)
       |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p14
  /** Deterministic global training-order shuffle — the step that turns a
    * curated corpus into an epoch's READ ORDER. The naive
    * `ORDER BY rand()` is wrong twice at 100 TB: it is irreproducible (a
    * retried stage resamples and the epoch silently changes), and the
    * global sort's random keys can't be re-derived by a resumed reader.
    * The production pattern is a KEYED HASH PERMUTATION: order key =
    * md5(epoch || ':' || doc_id) — a pure function of (epoch, doc_id),
    * so any worker can recompute any slice, epochs decorrelate by
    * construction (new epoch = new salt, no reshuffle job), and the
    * order is stable under retries, stragglers, and corpus re-reads.
    *
    * Global POSITIONS (the training-step index of each doc) use the same
    * two-level distributed prefix sum as p04: the hash key's first byte
    * is a 256-way range bucket (uniform by construction — md5 bytes),
    * within-bucket ranks come from a bucket-partitioned window, bucket
    * offsets from a 256-row running sum, position = offset + rank - 1.
    * No single-partition global window anywhere — that is the difference
    * between this and `row_number() OVER (ORDER BY key)`, which funnels
    * 100 TB through one task. A range-partitioned write by (epoch,
    * bucket) materializes training shards already in read order.
    *
    * Output (bounded, order-witnessing): the first 10 positions of each
    * of 2 epochs plus each epoch's LAST position — the tail row proves
    * the prefix sum covered the whole corpus (position N-1 exists
    * exactly once). The oracle restates the permutation with a flat
    * global window — the hash key's prefix IS the bucket, so ordering by
    * key alone is the identical total order.
    */
  private[graft] def p14Positions(docs: DataFrame): DataFrame = {
    val keyed = docs.withColumn("epoch", explode(array(lit(0), lit(1))))
      .withColumn("key", md5(concat(col("epoch").cast(StringType), lit(":"),
        col("doc_id").cast(StringType))))
      .withColumn("bucket", expr("cast(conv(substring(key, 1, 2), 16, 10) as int)"))
    val wIn = Window.partitionBy(col("epoch"), col("bucket"))
      .orderBy(col("key"), col("doc_id"))
    val ranked = keyed.withColumn("rk", row_number().over(wIn))
    // 512 rows total (2 epochs x 256 buckets): the running-sum window is
    // over a bucket-count frame, never the corpus
    val wOff = Window.partitionBy(col("epoch")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("epoch"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select(col("epoch"), col("bucket"), col("off"))
    ranked.join(offsets, Seq("epoch", "bucket"))
      .withColumn("position", col("off") + col("rk") - 1L)
  }

  def p14TrainingOrder(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"))
    val n = docs.agg(count(lit(1)).as("n"))
    p14Positions(docs)
      .crossJoin(broadcast(n))
      .filter(col("position") < 10 || col("position") === col("n") - 1L)
      .select(col("epoch"), col("position"), col("doc_id"), col("source"))
      .orderBy(col("epoch"), col("position"))
  }

  val p14Sql: String =
    """WITH e AS (
      |  SELECT doc_id, source, epoch
      |  FROM documents, unnest([0, 1]) AS u(epoch)),
      |k AS (
      |  SELECT epoch, doc_id, source,
      |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS key
      |  FROM e),
      |r AS (
      |  SELECT epoch, doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY key, doc_id) - 1 AS position
      |  FROM k),
      |n AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT epoch, position, doc_id, source FROM r, n
      |WHERE position < 10 OR position = n - 1
      |ORDER BY epoch, position""".stripMargin

  // ---------------------------------------------------------------- p15
  /** Dataset card — the per-source summary sheet a curated release ships
    * (HuggingFace dataset cards, Dolma/RedPajama release notes): volume,
    * token mass, length profile, language mix, and within-source exact-dup
    * rate, one row per source. This is the artifact a data curator reads
    * BEFORE the mixture weights (p05) are chosen, so it reuses the exact
    * fingerprint (d01's canonical md5) and token definitions
    * ([[graft.operators.TextQueries]]'s `[A-Za-z0-9]+` runs) the curation
    * operators themselves apply — the card and the pipeline cannot drift.
    *
    * Scale shape: one map pass over the corpus (regex token count + md5 —
    * no raw text leaves the scan), then source-keyed aggregation with
    * map-side combine; the language mode is a (source, lang)-keyed count —
    * cardinality sources x langs, trivially small at any corpus size —
    * joined back broadcast. `percentile` on n_chars is the one exact
    * (sort-based) aggregate; at 100 TB swap for approx_percentile and
    * relabel the column — the card is a report, not a gate. Deterministic:
    * mode tie-break is (count DESC, lang ASC); ratios use the shared
    * floor(x*1e4+0.5)/1e4 idiom.
    */
  def p15DatasetCard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("source"), col("lang"), col("n_chars"),
        size(expr("regexp_extract_all(text, '[A-Za-z0-9]+', 0)")).cast(LongType).as("n_toks"),
        md5(Tables.canonText(col("text"))).as("fp"))
      .cache() // two readers: the per-source rollup and the language mode
    try {
      docs.count()
      val card = docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        (floor(expr("percentile(n_chars, 0.5)") * 10.0 + 0.5) / 10.0).as("median_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("fp")).as("n_unique"))
      val topLang = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("lc"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("lc").desc, col("lang"))))
        .filter(col("rk") === 1)
        .select(col("source"), col("lang").as("top_lang"), col("lc"))
      card.join(broadcast(topLang), "source")
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("median_chars"), col("n_langs"), col("top_lang"),
          (floor(col("lc").cast(DoubleType) / col("n_docs") * 10000.0 + 0.5) / 10000.0).as("top_lang_share"),
          (floor((col("n_docs") - col("n_unique")).cast(DoubleType) / col("n_docs") * 10000.0 + 0.5) / 10000.0).as("dup_rate"))
        .orderBy(col("source"))
        .localCheckpoint() // materialize before the cache below is released
    } finally {
      docs.unpersist()
    }
  }

  val p15Sql: String =
    """WITH d AS (
      |  SELECT source, lang, n_chars,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_toks,
      |    md5(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS fp
      |  FROM documents),
      |card AS (
      |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
      |    FLOOR(CAST(MEDIAN(n_chars) AS DOUBLE) * 10.0 + 0.5) / 10.0 AS median_chars,
      |    COUNT(DISTINCT lang) AS n_langs, COUNT(DISTINCT fp) AS n_unique
      |  FROM d GROUP BY source),
      |tl AS (
      |  SELECT source, lang AS top_lang, lc FROM (
      |    SELECT source, lang, COUNT(*) AS lc,
      |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY COUNT(*) DESC, lang) AS rk
      |    FROM d GROUP BY source, lang)
      |  WHERE rk = 1)
      |SELECT source, n_docs, total_tokens, median_chars, n_langs, top_lang,
      |  FLOOR(CAST(lc AS DOUBLE) / n_docs * 10000.0 + 0.5) / 10000.0 AS top_lang_share,
      |  FLOOR(CAST(n_docs - n_unique AS DOUBLE) / n_docs * 10000.0 + 0.5) / 10000.0 AS dup_rate
      |FROM card JOIN tl USING (source) ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p16
  /** CDC merge (MERGE INTO semantics) — the snapshot-maintenance step
    * every continuously-crawled corpus needs: apply a changeset of
    * inserts / updates / deletes onto the previous snapshot and report
    * the per-source reconciliation a pipeline gates promotion on.
    *
    * The changeset is derived deterministically from the corpus so the
    * oracle can re-derive it: docs with id % 10 == 7 are "new" (absent
    * from the base snapshot, op I), id % 10 == 3 get re-crawled text
    * (op U, text + " v2"), id % 10 == 5 are takedowns (op D); everything
    * else is untouched base. Merge rule per key: D removes, U replaces,
    * I adds, no-change rows pass through — exactly MERGE INTO's WHEN
    * MATCHED / NOT MATCHED arms, spelled as one full-outer join on the
    * key plus arm predicates (the engine-neutral core of Delta/Iceberg
    * copy-on-write merge).
    *
    * Scale shape: ONE shuffle join on the snapshot key (with bucketed
    * base+changeset tables it degrades to a zipper merge with no
    * exchange); the changeset side is typically days-vs-corpus small, so
    * AQE broadcasts it — no hint needed either way. The audit rollup is
    * source-keyed with map-side combine; result-content checksums
    * (sum of ids, sum of text lengths — both exact int64) pin the merged
    * STATE, not just its cardinality, without shipping text anywhere.
    */
  def p16MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), col("text"))
    val base = docs.filter(col("doc_id") % 10 =!= 7)
    val cdc = docs.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("source"), col("text"), lit("I").as("op"))
      .unionAll(docs.filter(col("doc_id") % 10 === 3)
        .select(col("doc_id"), col("source"), concat(col("text"), lit(" v2")).as("text"), lit("U").as("op")))
      .unionAll(docs.filter(col("doc_id") % 10 === 5)
        .select(col("doc_id"), col("source"), col("text"), lit("D").as("op")))
    val merged = base.select(col("doc_id"), col("source").as("b_source"), col("text").as("b_text"))
      .join(cdc.select(col("doc_id"), col("source").as("c_source"),
        col("text").as("c_text"), col("op")), Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(col("doc_id"),
        coalesce(col("c_source"), col("b_source")).as("source"),
        coalesce(col("c_text"), col("b_text")).as("text"),
        col("op"))
    merged.groupBy(col("source")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_inserted"),
      sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_updated"),
      sum(col("doc_id")).as("sum_ids"),
      sum(length(col("text")).cast(LongType)).as("sum_chars"))
      .orderBy(col("source"))
  }

  val p16Sql: String =
    """WITH base AS (
      |  SELECT doc_id, source, text FROM documents WHERE doc_id % 10 <> 7),
      |cdc AS (
      |  SELECT doc_id, source, text, 'I' AS op FROM documents WHERE doc_id % 10 = 7
      |  UNION ALL
      |  SELECT doc_id, source, text || ' v2', 'U' FROM documents WHERE doc_id % 10 = 3
      |  UNION ALL
      |  SELECT doc_id, source, text, 'D' FROM documents WHERE doc_id % 10 = 5),
      |merged AS (
      |  SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
      |    COALESCE(c.source, b.source) AS source,
      |    COALESCE(c.text, b.text) AS text,
      |    c.op AS op
      |  FROM base b FULL OUTER JOIN cdc c ON b.doc_id = c.doc_id
      |  WHERE COALESCE(c.op, '') <> 'D')
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
      |  CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars
      |FROM merged GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p17
  /** Bucketed-table export + co-located SHUFFLE-FREE join — the physical
    * pattern every repeatedly-joined 100 TB corpus should ship as: write
    * both sides bucketed on the join key (`bucketBy(16, doc_id)` +
    * `sortBy`, Spark-native bucketing, no Hive needed), and every later
    * join on that key reads bucket i against bucket i directly — ZERO
    * Exchange on either side, on every run, forever. At corpus scale the
    * join shuffle is usually the single most expensive stage of a
    * pipeline run; bucketing moves that cost into the (one-time) write.
    * BucketedJoinSpec pins the physical claim: the joined plan contains a
    * SortMergeJoin and NO shuffle exchange on either input.
    *
    * The demo workload: documents co-located with their embedding norms
    * (doc_id = vec_id row alignment, as s10), rolled up per source. The
    * norm is floored at 1e-6 pre-join (same fold order as the DuckDB
    * list_reduce) and decimal-summed, so the oracle — the identical join
    * over the RAW parquet — hash-matches: bucketing changed the physical
    * plan, provably not the answer.
    *
    * Writes land under /tmp keyed by table content (dir name), mirroring
    * t17's sidecar contract: queries may materialize derived state
    * outside the repo, never inside the testdata.
    */
  def p17BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    bucketedTables(s, dir)
    val joined = colocatedJoin(s)
    joined.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        Tables.dsum(col("norm")).as("sum_norm"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  /** Idempotently (re)creates the two bucketed tables for this sf dir in
    * the session catalog. 16 buckets: at sf0.1 that is a few MB per
    * bucket; a 100 TB deployment picks bucket count once (data / ~1 GB)
    * and every writer and reader agrees on it from then on. */
  private[graft] def bucketedTables(s: SparkSession, dir: String): Unit = {
    val tag = java.lang.Long.toHexString(
      java.util.UUID.nameUUIDFromBytes(dir.getBytes("UTF-8")).getMostSignificantBits)
    val wh = s"/tmp/graft_bucketed_$tag"
    s.sql("DROP TABLE IF EXISTS graft_docs_bucketed")
    s.sql("DROP TABLE IF EXISTS graft_embs_bucketed")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .write.bucketBy(16, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/docs").mode("overwrite")
      .saveAsTable("graft_docs_bucketed")
    Tables.embeddings(s, dir)
      .withColumn("v", SimilarityQueries.embD)
      .select(col("vec_id").as("doc_id"),
        (floor(sqrt(SimilarityQueries.dot("v", "v")) * 1e6 + 0.5) / 1e6).as("norm"))
      .write.bucketBy(16, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/embs").mode("overwrite")
      .saveAsTable("graft_embs_bucketed")
  }

  /** The co-located join itself (exposed for the plan spec): merge-hinted
    * so the shuffle-free claim is about bucketing, not about the small
    * side happening to broadcast at test scale. */
  private[graft] def colocatedJoin(s: SparkSession): DataFrame =
    s.table("graft_docs_bucketed").hint("merge")
      .join(s.table("graft_embs_bucketed"), Seq("doc_id"))

  val p17Sql: String =
    """WITH n AS (
      |  SELECT vec_id AS doc_id,
      |    FLOOR(SQRT(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), (a, b) -> a + b)) * 1e6 + 0.5) / 1e6 AS norm
      |  FROM embeddings)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(CAST(SUM(CAST(norm AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sum_norm,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents JOIN n USING (doc_id)
      |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p18
  /** Incremental view maintenance — the OTHER half of p16's CDC story:
    * p16 maintains the SNAPSHOT under a changeset; p18 maintains a
    * MATERIALIZED ROLLUP (per-source doc count + character mass) without
    * ever recomputing it from the merged corpus. The maintenance algebra:
    *
    *   new_mv = old_mv (+) delta(changeset)
    *   delta:  I -> (+1, +len(new));  D -> (-1, -len(old));
    *           U -> (0, len(new) - len(old))
    *
    * Old lengths come from a doc_id-keyed join of JUST the U/D changeset
    * rows against the base — at production scale that is point lookups /
    * a changeset-sized join, so a nightly maintenance run costs
    * O(|MV| + |changeset|) while the recompute costs a full corpus scan.
    * That asymmetry is the whole point of IVM at 100 TB: the rollup the
    * dashboard reads is maintained in seconds regardless of corpus size.
    *
    * The changeset is p16's exact deterministic construction (I: id%10=7,
    * U: id%10=3 with " v2" appended, D: id%10=5), so the oracle can take
    * the adversarial path: recompute the rollup DIRECTLY from the merged
    * corpus state. Hash equality between the incrementally-maintained
    * view and the from-scratch recompute is precisely the IVM
    * correctness contract; the published per-source deltas are what an
    * operator alerts on (a source suddenly shedding mass).
    *
    * Edge semantics the testdata actually exercises (source = doc_id %
    * 20, so some sources are 100% inserts or 100% deletes): a brand-new
    * source appears with its full insert mass, and a source whose docs
    * all delete REMAINS in the view with n_docs = 0 and its negative
    * delta — an emptied source is an alert, not a silent disappearance.
    */
  def p18IncrementalRollup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), col("text"))
    val base = docs.filter(col("doc_id") % 10 =!= 7)
    // stands in for reading the stored MV — never re-derived below
    val mv = base.groupBy(col("source")).agg(
      count(lit(1)).as("n0"),
      sum(length(col("text")).cast(LongType)).as("c0"))
    val ins = docs.filter(col("doc_id") % 10 === 7)
      .select(col("source"), lit(1L).as("dd"),
        length(col("text")).cast(LongType).as("dc"))
    val cdcUD = docs.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id"), col("source"),
        concat(col("text"), lit(" v2")).as("new_text"), lit("U").as("op"))
      .unionAll(docs.filter(col("doc_id") % 10 === 5)
        .select(col("doc_id"), col("source"),
          lit(null).cast(StringType).as("new_text"), lit("D").as("op")))
    val oldLen = base.select(col("doc_id"), length(col("text")).cast(LongType).as("old_len"))
    val udDelta = cdcUD.join(oldLen, Seq("doc_id"))
      .select(col("source"),
        when(col("op") === "U", lit(0L)).otherwise(lit(-1L)).as("dd"),
        when(col("op") === "U",
          length(col("new_text")).cast(LongType) - col("old_len"))
          .otherwise(-col("old_len")).as("dc"))
    val delta = ins.unionAll(udDelta)
      .groupBy(col("source")).agg(sum(col("dd")).as("dd"), sum(col("dc")).as("dc"))
    mv.join(delta, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dd"), lit(0L))).as("n_docs"),
        (coalesce(col("c0"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("sum_chars"),
        coalesce(col("dd"), lit(0L)).as("d_docs"),
        coalesce(col("dc"), lit(0L)).as("d_chars"))
      .orderBy(col("source"))
  }

  /** The adversarial oracle path: the SAME rollup recomputed from scratch
    * over the merged corpus state (and the deltas from the base rollup) —
    * if the incremental algebra drops or double-counts anything, the hash
    * cannot match. */
  val p18Sql: String =
    """WITH base AS (
      |  SELECT doc_id, source, text FROM documents WHERE doc_id % 10 <> 7),
      |merged AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 10 = 3 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 10 <> 5),
      |cur AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars
      |  FROM merged GROUP BY source),
      |prev AS (
      |  SELECT source, COUNT(*) AS n0,
      |    CAST(SUM(LENGTH(text)) AS BIGINT) AS c0
      |  FROM base GROUP BY source)
      |SELECT COALESCE(cur.source, prev.source) AS source,
      |  CAST(COALESCE(cur.n_docs, 0) AS BIGINT) AS n_docs,
      |  CAST(COALESCE(cur.sum_chars, 0) AS BIGINT) AS sum_chars,
      |  CAST(COALESCE(cur.n_docs, 0) - COALESCE(prev.n0, 0) AS BIGINT) AS d_docs,
      |  CAST(COALESCE(cur.sum_chars, 0) - COALESCE(prev.c0, 0) AS BIGINT) AS d_chars
      |FROM cur FULL OUTER JOIN prev ON cur.source = prev.source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p19
  /** Multimodal corpus curation — the composition the m-tier exists for:
    * ONE keeper set over a corpus whose items duplicate through DIFFERENT
    * modalities. The ingest batch is every document plus its re-encoded
    * media variant (m03's perturbed image twins, m04's gain-scaled audio
    * twins, and m05's single-frame-watermarked video twins,
    * id + 1,000,000 — the "same asset re-uploaded after an edit" case
    * text dedup cannot see, because the variant has no text). Four pair
    * relations feed one clustering:
    *
    *   text:  d04's verified MinHash-LSH pairs (exact Jaccard >= 0.5);
    *   media: m03's banded-aHash image pairs (Hamming <= 7), m04's
    *          banded energy-fingerprint audio pairs (Hamming <= 3), and
    *          m05's frame-aligned video pairs (>= 4 of 6 frames at
    *          Hamming <= 7) — every modality now fingerprints.
    *
    * Union → connected components (d06's min-label machinery) → keeper =
    * the component's min id → per-item verdict attributed by the
    * modality of the edges that doomed it (drop_text / drop_media /
    * drop_both). Output: (kind, is_twin, verdict, n) — the curation
    * dashboard row set: twins must drop via media edges, same-text docs
    * via text edges, and the keeper count is the curated corpus size.
    *
    * Oracle: calling m03/m04/m05 refreshes their fingerprint sidecars for
    * this sf as a side effect, so DuckDB re-derives the media pair sets
    * from the sidecars, the text pairs from raw SQL (d04's CTE), the
    * components via the recursive-CTE closure (d06's contract), and the
    * attribution rollup — the whole composition is hash-audited.
    *
    * Scale: every pair source is band/bucket-scoped (no all-pairs
    * anywhere); the CC loop checkpoints per round and a 100 TB corpus
    * swaps in g05's large-star/small-star variant; the rollup is one
    * tiny aggregation. The twins double only the MEDIA-fingerprint rows,
    * never the text-shingle volume.
    */
  def p19MultimodalCuration(s: SparkSession, dir: String): DataFrame = {
    val text = DedupQueries.d04MinhashLsh(s, dir)
      .select(col("da"), col("db"), lit("text").as("mtype"))
    val img = Multimodal.m03ImageDedup(s, dir)
      .select(col("ida").as("da"), col("idb").as("db"), lit("media").as("mtype"))
    val aud = Multimodal.m04AudioDedup(s, dir)
      .select(col("ida").as("da"), col("idb").as("db"), lit("media").as("mtype"))
    val vid = Multimodal.m05VideoDedup(s, dir)
      .select(col("ida").as("da"), col("idb").as("db"), lit("media").as("mtype"))
    // cache: the union feeds CC (both edge directions), the per-item
    // flags, and nothing else — one materialization, three readers
    val pairs = text.unionAll(img).unionAll(aud).unionAll(vid).cache()
    pairs.count()
    val labels = DedupQueries.connectedComponents(
      pairs.select(col("da"), col("db")).distinct())
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val items = docs.select(col("doc_id").as("id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        lit(false).as("is_twin"))
      .unionAll(docs
        .select((col("doc_id") + 1000000L).as("id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
          lit(true).as("is_twin")))
    val flags = pairs.select(col("da").as("id"), col("mtype"))
      .unionAll(pairs.select(col("db").as("id"), col("mtype")))
      .groupBy(col("id"))
      .agg(expr("bool_or(mtype = 'text')").as("has_text"),
        expr("bool_or(mtype = 'media')").as("has_media"))
    items
      .join(labels.select(col("doc_id").as("id"), col("lbl")), Seq("id"), "left")
      .join(flags, Seq("id"), "left")
      .withColumn("verdict",
        when(col("lbl").isNull || col("lbl") === col("id"), "keep")
          .when(col("has_text") && col("has_media"), "drop_both")
          .when(col("has_media"), "drop_media")
          .otherwise("drop_text"))
      .groupBy(col("kind"), col("is_twin"), col("verdict"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("kind"), col("is_twin"), col("verdict"))
  }

  /** Text pairs restated from raw SQL (d04's CTE prefix), media pairs
    * from the m03/m04 fingerprint sidecars this query's run refreshed,
    * closure via the recursive CTE, identical attribution arithmetic. */
  private def p19Sql: String = {
    def banded(name: String, maxHamming: Int): String =
      s"""SELECT a.media_id AS da, b.media_id AS db FROM
        |  (SELECT media_id, h, g.b AS band, (h >> (g.b * 8)) & 255 AS bucket
        |   FROM '${graft.Sidecars.oraclePath(name)}/*.parquet', unnest(generate_series(0, 7)) AS g(b)) a
        |  JOIN
        |  (SELECT media_id, h, g.b AS band, (h >> (g.b * 8)) & 255 AS bucket
        |   FROM '${graft.Sidecars.oraclePath(name)}/*.parquet', unnest(generate_series(0, 7)) AS g(b)) b
        |  ON a.band = b.band AND a.bucket = b.bucket AND a.media_id < b.media_id
        |  WHERE bit_count(xor(a.h, b.h)) <= $maxHamming
        |  GROUP BY a.media_id, b.media_id""".stripMargin
    s"""WITH RECURSIVE docs AS (
      |  SELECT doc_id,
      |    string_split(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
      |  FROM docs, unnest(generate_series(1, GREATEST(len(toks) - 2, 0))) AS u(i)),
      |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_inter
      |  FROM sh a JOIN sh b
      |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |tpairs AS (
      |  SELECT da, db FROM inter
      |  JOIN counts ca ON inter.da = ca.doc_id
      |  JOIN counts cb ON inter.db = cb.doc_id
      |  WHERE CAST(n_inter AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE) >= 0.5),
      |ipairs AS (${banded("m03_ahash", 7)}),
      |apairs AS (${banded("m04_audiofp", 3)}),
      |vpairs AS (
      |  SELECT da, db FROM (
      |    SELECT DISTINCT a.media_id AS da, b.media_id AS db, a.frame_idx,
      |      bit_count(xor(a.h, b.h)) AS hamming
      |    FROM (SELECT media_id, frame_idx, h, g.b AS band, (h >> (g.b * 8)) & 255 AS bucket
      |          FROM '${graft.Sidecars.oraclePath("m05_videofp")}/*.parquet', unnest(generate_series(0, 7)) AS g(b)) a
      |    JOIN (SELECT media_id, frame_idx, h, g.b AS band, (h >> (g.b * 8)) & 255 AS bucket
      |          FROM '${graft.Sidecars.oraclePath("m05_videofp")}/*.parquet', unnest(generate_series(0, 7)) AS g(b)) b
      |      ON a.band = b.band AND a.bucket = b.bucket AND a.frame_idx = b.frame_idx
      |      AND a.media_id < b.media_id
      |    WHERE bit_count(xor(a.h, b.h)) <= 7)
      |  GROUP BY da, db HAVING COUNT(*) >= 4),
      |allpairs AS (
      |  SELECT da, db, 'text' AS mtype FROM tpairs
      |  UNION ALL SELECT da, db, 'media' FROM ipairs
      |  UNION ALL SELECT da, db, 'media' FROM apairs
      |  UNION ALL SELECT da, db, 'media' FROM vpairs),
      |edges AS (SELECT DISTINCT da AS u, db AS v FROM allpairs
      |          UNION SELECT DISTINCT db, da FROM allpairs),
      |reach(u, v) AS (
      |  SELECT u, u FROM edges
      |  UNION
      |  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
      |comp AS (SELECT u AS id, MIN(v) AS lbl FROM reach GROUP BY u),
      |items AS (
      |  SELECT doc_id AS id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    FALSE AS is_twin
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END, TRUE
      |  FROM documents),
      |flags AS (
      |  SELECT id, BOOL_OR(mtype = 'text') AS has_text,
      |    BOOL_OR(mtype = 'media') AS has_media
      |  FROM (SELECT da AS id, mtype FROM allpairs
      |        UNION ALL SELECT db, mtype FROM allpairs)
      |  GROUP BY id)
      |SELECT i.kind, i.is_twin,
      |  CASE WHEN c.lbl IS NULL OR c.lbl = i.id THEN 'keep'
      |       WHEN f.has_text AND f.has_media THEN 'drop_both'
      |       WHEN f.has_media THEN 'drop_media'
      |       ELSE 'drop_text' END AS verdict,
      |  COUNT(*) AS n
      |FROM items i
      |LEFT JOIN comp c ON c.id = i.id
      |LEFT JOIN flags f ON f.id = i.id
      |GROUP BY 1, 2, 3 ORDER BY kind, is_twin, verdict""".stripMargin
  }

  // ---------------------------------------------------------------- p20
  /** SCD2 dimension versioning — the TYPE-2 counterpart to p16's type-1
    * MERGE: instead of overwriting attribute changes, every change opens
    * a new version row and closes the previous one, producing the
    * (valid_from, valid_to, is_current) history table warehouse
    * dimensions keep so facts can join "as of" any date (q31/q61's as-of
    * joins are the read side of exactly this table shape).
    *
    * The change log is derived deterministically so the oracle can
    * re-derive it: each order is an attribute-change EVENT for its
    * customer (attr = o_orderpriority, event time = o_orderdate,
    * tie-break = o_orderkey; customers sampled custkey % 17 = 3 to keep
    * the published table a bounded audit slice). The rebuild is the
    * standard log-to-SCD2 pipeline:
    *
    *   1. change detection: keep events whose attr differs from the
    *      previous event's (LAG over the per-key ordered log) — runs of
    *      the same value collapse into one version;
    *   2. interval assembly: valid_from = change time, valid_to = next
    *      change's time (LEAD; NULL = open/current), version_no =
    *      per-key ROW_NUMBER.
    *
    * Zero-duration versions (two different-attr events on one date) are
    * kept deliberately — they preserve the full audit trail and the
    * deterministic orderkey tie-break makes them stable.
    *
    * Plan shape at 100 TB: both window passes partition by custkey and
    * share ONE ordering, so Catalyst plans a single exchange with
    * stacked Window operators over per-key partitions (millions of
    * bounded groups — embarrassingly parallel); no global sort anywhere
    * except the output contract's ORDER BY. A continuously-maintained
    * deployment applies p18's incremental pattern on top: only keys
    * present in the day's changeset recompute their tail versions.
    */
  def p20Scd2Dimension(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.orders(s, dir)
      .filter(col("o_custkey") % 17 === 3)
      .select(col("o_custkey").as("custkey"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("seq"), col("o_orderpriority").as("attr"))
    val w = Window.partitionBy(col("custkey")).orderBy(col("ts"), col("seq"))
    val changes = ev.withColumn("prev", lag(col("attr"), 1).over(w))
      .filter(col("prev").isNull || col("attr") =!= col("prev"))
    // the open version's valid_to is the conventional SCD2 sentinel
    // 9999-12-31 (not NULL): range predicates `BETWEEN valid_from AND
    // valid_to` then need no NULL arm, and engines disagree on NULL
    // ordering/equality far more than on a date literal
    changes
      .withColumn("version_no", row_number().over(w).cast(LongType))
      .withColumn("valid_from", col("ts"))
      .withColumn("nxt", lead(col("ts"), 1).over(w))
      .withColumn("is_current", col("nxt").isNull)
      .withColumn("valid_to", coalesce(col("nxt"), to_date(lit("9999-12-31"))))
      .select(col("custkey"), col("version_no"), col("attr"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("custkey"), col("version_no"))
  }

  /** The same two-stage rebuild: LAG change detection, LEAD interval
    * assembly, identical per-key ordering and tie-break. */
  val p20Sql: String =
    """WITH ev AS (
      |  SELECT o_custkey AS custkey, o_orderdate AS ts, o_orderkey AS seq,
      |    o_orderpriority AS attr
      |  FROM orders WHERE o_custkey % 17 = 3),
      |ch AS (
      |  SELECT custkey, ts, seq, attr FROM (
      |    SELECT custkey, ts, seq, attr,
      |      LAG(attr) OVER (PARTITION BY custkey ORDER BY ts, seq) AS prev
      |    FROM ev)
      |  WHERE prev IS NULL OR attr <> prev)
      |SELECT custkey, version_no, attr, valid_from,
      |  COALESCE(nxt, DATE '9999-12-31') AS valid_to,
      |  (nxt IS NULL) AS is_current
      |FROM (
      |  SELECT custkey, attr, ts AS valid_from,
      |    ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY ts, seq) AS version_no,
      |    LEAD(ts) OVER (PARTITION BY custkey ORDER BY ts, seq) AS nxt
      |  FROM ch)
      |ORDER BY custkey, version_no""".stripMargin

  // ---------------------------------------------------------------- p21
  /** Sequence-length batching-efficiency audit — the padding-waste
    * measurement behind length-grouped batching (HF `group_by_length` /
    * sequence bucketing): every padding token in a training batch is a
    * wasted FLOP, and the win of grouping by length is exactly the gap
    * between padding-to-512 and padding-to-the-bucket-max. Per doc:
    * effective length = min(token count, 512) (the truncation a 512-seq
    * trainer applies; p10's token convention). Docs bin into 16
    * equal-width length buckets (q94's pattern: bounds from a broadcast
    * scalar maximum — a map pass, no global sort), and each bucket row
    * reports both costs over ITS docs:
    *
    *   padding_bucketed = bucket_max * n - sum(eff)   (pad to bucket max)
    *   padding_fixed    = 512 * n - sum(eff)          (pad to model max)
    *
    * so the corpus-level saving is one more SUM over 16 rows. Integer-
    * exact throughout; the oracle restates binning and both cost
    * formulas. At 100 TB this audit is one scan + a 16-key aggregation.
    */
  def p21PaddingAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"),
        least(size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0)))
          .cast(LongType), lit(512L)).as("eff"))
    val bounds = docs.agg(max(col("eff")).as("em"))
    docs.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr("(eff * 16) div (em + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), min(col("eff")).as("eff_min"),
        max(col("eff")).as("eff_max"), sum(col("eff")).as("sum_eff"))
      .select(col("bucket"), col("n_docs"), col("eff_min"), col("eff_max"),
        (col("eff_max") * col("n_docs") - col("sum_eff")).as("padding_bucketed"),
        (lit(512L) * col("n_docs") - col("sum_eff")).as("padding_fixed"))
      .orderBy(col("bucket"))
  }

  /** Identical truncation, equal-width binning off the same maximum, and
    * both padding-cost formulas. */
  val p21Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    LEAST(CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT), 512) AS eff
      |  FROM documents),
      |b AS (SELECT MAX(eff) AS em FROM d),
      |binned AS (
      |  SELECT doc_id, eff, (eff * 16) // (b.em + 1) AS bucket FROM d CROSS JOIN b),
      |agg AS (
      |  SELECT bucket, COUNT(*) AS n_docs, MIN(eff) AS eff_min, MAX(eff) AS eff_max,
      |    CAST(SUM(eff) AS BIGINT) AS sum_eff
      |  FROM binned GROUP BY bucket)
      |SELECT bucket, n_docs, eff_min, eff_max,
      |  eff_max * n_docs - sum_eff AS padding_bucketed,
      |  512 * n_docs - sum_eff AS padding_fixed
      |FROM agg ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- p22
  /** Deletion propagation — the right-to-be-forgotten cascade every
    * pipeline holding user data must run: a (small) tombstone list of
    * user ids is propagated through the fact table AND through the
    * derived rollup the dashboards read, producing the compliance audit
    * row set (per event type: volume before, rows purged, users
    * affected, volume and value mass after).
    *
    * The load-bearing design point is WHAT gets scanned: the tombstone
    * list is broadcast (a deletion request batch is KBs against 100 TB
    * of facts), the purge itself is one broadcast LEFT SEMI join to
    * extract the doomed rows, and the maintained rollup is updated with
    * NEGATIVE DELTAS computed from those doomed rows alone — p18's IVM
    * algebra applied to deletion, O(|purged|), never a recompute over
    * the surviving 100 TB. (On lakehouse storage the same semi-join
    * drives file-level rewrite of only the files containing matches —
    * deletion vectors / merge-on-read; the query shape is identical.)
    *
    * Value mass is merged in exact DECIMAL space and cast to double only
    * at the edge: v_before - v_delta must equal the from-scratch decimal
    * sum over survivors BIT-FOR-BIT, which double-space subtraction
    * cannot promise. The oracle takes the adversarial path: it
    * recomputes the after-state directly from the surviving rows — if
    * the incremental deltas drop or double-count anything, the hash
    * cannot match.
    */
  def p22DeletionPropagation(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    // stands in for the deletion-request table: deterministic, tiny
    val tomb = ev.filter(col("user_id") % 97 === 13)
      .select(col("user_id")).distinct()
    val doomed = ev.join(broadcast(tomb), Seq("user_id"), "left_semi")
    val dec = (c: Column) => sum(c.cast(DecimalType(30, 2)))
    // stands in for reading the stored rollup (p18's stance) — the
    // after-state below derives from it plus the deltas, never rescanned
    val mv = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n0"), dec(col("value")).as("v0"))
    val delta = doomed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("d_rows"),
        count_distinct(col("user_id")).as("n_users"),
        dec(col("value")).as("dv"))
    val zero = lit(0).cast(DecimalType(30, 2))
    mv.join(delta, Seq("event_type"), "left")
      .select(col("event_type"),
        col("n0").as("n_before"),
        coalesce(col("d_rows"), lit(0L)).as("d_rows"),
        (col("n0") - coalesce(col("d_rows"), lit(0L))).as("n_after"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        col("v0").cast(DoubleType).as("v_before"),
        (col("v0") - coalesce(col("dv"), zero)).cast(DoubleType).as("v_after"))
      .orderBy(col("event_type"))
  }

  /** Adversarial oracle: before-state from all rows, but the AFTER-state
    * recomputed from scratch over the surviving rows only — hash equality
    * proves the negative-delta maintenance lands exactly on the ground
    * truth a full recompute would produce. */
  val p22Sql: String =
    """WITH tomb AS (
      |  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 13),
      |mv AS (
      |  SELECT event_type, COUNT(*) AS n0,
      |    SUM(CAST(value AS DECIMAL(30,2))) AS v0
      |  FROM events GROUP BY 1),
      |del AS (
      |  SELECT event_type, COUNT(*) AS d_rows,
      |    COUNT(DISTINCT user_id) AS n_users
      |  FROM events WHERE user_id IN (SELECT user_id FROM tomb) GROUP BY 1),
      |ret AS (
      |  SELECT event_type, COUNT(*) AS n1,
      |    SUM(CAST(value AS DECIMAL(30,2))) AS v1
      |  FROM events WHERE user_id NOT IN (SELECT user_id FROM tomb) GROUP BY 1)
      |SELECT mv.event_type,
      |  mv.n0 AS n_before,
      |  CAST(COALESCE(del.d_rows, 0) AS BIGINT) AS d_rows,
      |  CAST(COALESCE(ret.n1, 0) AS BIGINT) AS n_after,
      |  CAST(COALESCE(del.n_users, 0) AS BIGINT) AS n_users,
      |  CAST(CAST(mv.v0 AS VARCHAR) AS DOUBLE) AS v_before,
      |  CAST(CAST(COALESCE(ret.v1, 0) AS VARCHAR) AS DOUBLE) AS v_after
      |FROM mv
      |LEFT JOIN del ON mv.event_type = del.event_type
      |LEFT JOIN ret ON mv.event_type = ret.event_type
      |ORDER BY mv.event_type""".stripMargin

  // ---------------------------------------------------------------- p23
  /** Size-balanced training-shard manifest — the step that turns a
    * curated corpus into N fixed-token-budget shards plus the manifest a
    * training launcher reads (per-shard doc count, token mass, byte-range
    * offsets). Real pipelines cut shards by TOKENS, not documents —
    * equal-doc shards skew wall-clock per data-loader worker when length
    * distributions are heavy-tailed.
    *
    * Shard assignment is greedy-by-offset over the p14 hash-permuted
    * order (key = md5('shard:' || doc_id) — reproducible, re-derivable
    * by any worker, decorrelated from ingest order): each doc's global
    * token START offset comes from the same two-level distributed prefix
    * sum as p04/p14 (256-way md5-prefix range buckets; within-bucket
    * window + 256-row offset frame — no corpus-wide ranking window), and
    * shard_id = start_off div ceil(total/16). A document never splits
    * (the greedy contract: a shard owns every doc that STARTS inside its
    * token budget), so the last shard absorbs the rounding tail — the
    * manifest's sum_tokens column makes that imbalance measurable, which
    * is the point of shipping a manifest at all.
    *
    * Output: 16 rows — shard_id, n_docs, sum_tokens, first_off, end_off
    * (contiguity witness: each shard's end_off is the next's first_off).
    * Oracle restates the permutation as a flat global window (the md5
    * prefix IS the bucket — p14's ordering argument) + identical integer
    * div arithmetic.
    */
  def p23ShardManifest(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(s, dir))
      .withColumn("n_tokens",
        expr("size(regexp_extract_all(text, '[A-Za-z0-9]+', 0))").cast(LongType))
      .withColumn("key", md5(concat(lit("shard:"), col("doc_id").cast(StringType))))
      .withColumn("bucket", expr("cast(conv(substring(key, 1, 2), 16, 10) as int)"))
      .select(col("doc_id"), col("n_tokens"), col("key"), col("bucket"))
      .cache() // three readers: within-bucket window, bucket offsets, total
    try {
      toks.count()
      val wIn = Window.partitionBy(col("bucket")).orderBy(col("key"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val within = toks.withColumn("within_off",
        coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      // 256 rows: the running-sum frame is bucket-count-sized, never corpus-sized
      val wOff = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
      val offsets = toks.groupBy(col("bucket"))
        .agg(sum(col("n_tokens")).as("bt"))
        .withColumn("bucket_off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
        .select(col("bucket"), col("bucket_off"))
      // div, not `/`: Spark's `/` on longs is double division
      val target = toks.agg(sum(col("n_tokens")).as("t"))
        .select(expr("greatest((t + 15L) div 16L, 1L)").as("target"))
      within.join(offsets, Seq("bucket"))
        .withColumn("start_off", col("bucket_off") + col("within_off"))
        .crossJoin(broadcast(target))
        .withColumn("shard_id", expr("start_off div target"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("start_off")).as("first_off"),
          max(col("start_off") + col("n_tokens")).as("end_off"))
        .orderBy(col("shard_id"))
        .localCheckpoint() // materialize before the cache below is released
    } finally toks.unpersist()
  }

  /** Flat-global-window restatement of the two-level prefix sum (md5
    * prefix = bucket, so ORDER BY key, doc_id is the identical total
    * order) + the same ceil-div shard arithmetic. */
  val p23Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
      |    md5('shard:' || CAST(doc_id AS VARCHAR)) AS key
      |  FROM documents),
      |offs AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY key, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
      |  FROM toks),
      |g AS (SELECT GREATEST((CAST(SUM(n_tokens) AS BIGINT) + 15) // 16, 1) AS target FROM toks)
      |SELECT start_off // target AS shard_id,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      |  MIN(start_off) AS first_off,
      |  MAX(start_off + n_tokens) AS end_off
      |FROM offs CROSS JOIN g
      |GROUP BY 1 ORDER BY shard_id""".stripMargin

  // ---------------------------------------------------------------- p24
  /** Robust outlier gate (Hampel filter / MAD z-score) — the numeric-
    * column cleaning step a pipeline runs before aggregating telemetry
    * or pricing signals: mean/stddev gates break on the very outliers
    * they hunt (one 1e9 reading inflates sigma until nothing is an
    * outlier), so the production rule is median ± k * MAD, both
    * breakdown-point-0.5 estimators. Flag = |x - median| > 5 * 1.4826 *
    * MAD + eps (1.4826 is the Gaussian consistency constant; eps = half
    * a unit keeps a zero-MAD group from flagging every non-median row).
    *
    * Exactness: values route through integer cents (floor(v*100 + 0.5)),
    * so medians interpolate exact .0/.5 halves and every deviation is
    * exactly representable — the double comparisons are bit-identical
    * across engines. Two grouped EXACT percentile passes (sort-based;
    * the documented 100 TB swap is approx_percentile + relabel, p15's
    * convention) + broadcast scalar joins + a map-only flag pass.
    */
  def p24RobustOutlierGate(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("cents", expr("cast(floor(value * 100D + 0.5D) as bigint)"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.5D)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("cents").cast(DoubleType) - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .withColumn("is_outlier",
        col("adev") > lit(5.0) * lit(1.4826) * col("mad") + lit(50.0))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("med")).as("median_cents"),
        min(col("mad")).as("mad_cents"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
        max(col("adev")).as("max_abs_dev"))
      .orderBy(col("event_type"))
  }

  /** Identical integer-cents routing, exact interpolated medians
    * (QUANTILE_CONT = Spark percentile, the q51-proven pair), same
    * left-associated double threshold arithmetic. */
  val p24Sql: String =
    """WITH c AS (
      |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |m AS (SELECT event_type, QUANTILE_CONT(cents, 0.5) AS med FROM c GROUP BY 1),
      |d AS (
      |  SELECT c.event_type, cents, ABS(CAST(cents AS DOUBLE) - med) AS adev, med
      |  FROM c JOIN m USING (event_type)),
      |md AS (SELECT event_type, QUANTILE_CONT(adev, 0.5) AS mad FROM d GROUP BY 1)
      |SELECT d.event_type, COUNT(*) AS n, MIN(med) AS median_cents, MIN(mad) AS mad_cents,
      |  CAST(SUM(CASE WHEN adev > 5.0 * 1.4826 * mad + 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  MAX(adev) AS max_abs_dev
      |FROM d JOIN md USING (event_type)
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- p26
  /** Temperature-sampled mixture (tau = 0.5) — the UniMax/T5-style
    * mixing rule where per-source keep rates are COMPUTED from corpus
    * statistics instead of configured (p05's fixed-rate sampler is the
    * "mixture weights chosen by a human" stage; this is the "weights
    * derived from the data" stage): keep probability p_s proportional to
    * n_s^(tau-1) = 1/sqrt(n_s), scaled so the expected sample is half
    * the corpus — big sources are down-sampled toward parity, small
    * sources ride along nearly whole, the standard fix for web-crawl
    * domination of multilingual/multi-domain mixes.
    *
    * Cross-engine exactness without trusting libm: tau = 0.5 makes the
    * weight a SQRT (IEEE-correctly-rounded everywhere, unlike pow(x,
    * 0.7)), each sqrt rounds to integer milli units, their sum is exact
    * int64, and the per-source keep threshold is ONE double division of
    * two exactly-representable integers times a power of two (exact) —
    * floor of a correctly-rounded quotient, bit-identical in both
    * engines. Docs keep by comparing their first 8 md5 hex digits as a
    * 32-bit integer against the threshold (q30/p05's reproducible-
    * sampling convention, fine-grained to 1/2^32).
    */
  def p26TemperatureMixture(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("source"), col("doc_id"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
      .withColumn("s_milli",
        expr("cast(floor(sqrt(cast(n_src as double)) * 1000D + 0.5D) as bigint)"))
    val tot = counts.agg(sum(col("s_milli")).as("sum_s"), sum(col("n_src")).as("n_total"))
    val thr = counts.crossJoin(broadcast(tot))
      // div, not `/`: Spark's `/` on longs is double division; the one
      // intended double division is the final quotient
      .withColumn("thr", expr(
        """cast(least(
          |  floor(cast((n_total div 2) * 1000000L as double) * 4294967296.0D
          |    / cast(s_milli * sum_s as double)),
          |  4294967296.0D) as bigint)""".stripMargin))
      .select(col("source"), col("n_src"), col("s_milli"), col("thr"))
    docs.join(broadcast(thr), "source")
      .withColumn("hex32",
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"))
      .withColumn("kept", col("hex32") < col("thr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("thr")).as("thr"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("achieved_rate",
        floor(col("n_kept").cast(DoubleType) / col("n_docs") * 10000.0 + 0.5) / 10000.0)
      .orderBy(col("source"))
  }

  /** Identical integer-milli sqrt weights, the same one-division double
    * threshold, the same 8-hex-digit keep rule. */
  val p26Sql: String =
    """WITH c AS (
      |  SELECT source, COUNT(*) AS n_src,
      |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS s_milli
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(SUM(s_milli) AS BIGINT) AS sum_s,
      |             CAST(SUM(n_src) AS BIGINT) AS n_total FROM c),
      |th AS (
      |  SELECT source, n_src, s_milli,
      |    CAST(LEAST(
      |      FLOOR(CAST((n_total // 2) * 1000000 AS DOUBLE) * 4294967296.0
      |        / CAST(s_milli * sum_s AS DOUBLE)),
      |      4294967296.0) AS BIGINT) AS thr
      |  FROM c CROSS JOIN t),
      |d AS (
      |  SELECT th.source, th.thr,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT < th.thr AS kept
      |  FROM documents JOIN th USING (source))
      |SELECT source, COUNT(*) AS n_docs, MIN(thr) AS thr,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  FLOOR(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS achieved_rate
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p27
  /** Join-key skew audit — the measurement that decides BEFORE a big
    * join whether to salt (q32), let AQE split (PlanShapeSpec's skew
    * join), or do nothing: per-key row counts on the probe side's join
    * key, the exact p95 of that count distribution, the hot keys that
    * exceed it, and the derived salt factor ceil(max/p95) — the
    * replication count q32-style salting would need to level the
    * hottest partition down to typical size.
    *
    * Exactness: the p95 threshold comes from the bounded-cardinality
    * count histogram (t20's integer `20*cum >= 19*n` arithmetic — counts
    * repeat heavily, so the histogram is tiny), NOT from a percentile
    * aggregate whose interpolation could drift cross-engine. Everything
    * else is int64 counts and one ceil integer division; share_micro is
    * the p26 one-division rule.
    *
    * Plan shape at 100 TB: one map-side-combined count per key (the
    * aggregation any join pre-scan does anyway), a histogram over the
    * distinct COUNT VALUES (bounded, ~hundreds even at 1e9 keys), a
    * broadcast scalar join of the thresholds, and a top-10. Nothing
    * rescans the fact table twice.
    */
  def p27SkewAudit(s: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.orders(s, dir)
      .groupBy(col("o_custkey").cast("long").as("custkey"))
      .agg(count(lit(1)).as("cnt"))
    val hist = perKey.groupBy(col("cnt")).agg(count(lit(1)).as("freq"))
    import org.apache.spark.sql.expressions.Window
    // window over distinct count VALUES — bounded by the count range,
    // not by keys (t20's bounded-cardinality histogram rationale)
    val wcum = Window.orderBy(col("cnt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("freq")).over(wcum))
    val tot = perKey.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    val p95 = cum.crossJoin(broadcast(tot))
      .filter(col("cum") * 20 >= col("n_keys") * 19)
      .agg(min(col("cnt")).as("p95_cnt"))
    val thr = tot.crossJoin(broadcast(p95))
      .withColumn("salt_factor",
        expr("(max_cnt + p95_cnt - 1) div p95_cnt"))
    perKey.crossJoin(broadcast(thr))
      .filter(col("cnt") > col("p95_cnt"))
      .withColumn("share_micro",
        floor(col("cnt").cast(DoubleType) / col("n_rows").cast(DoubleType) * 1e6).cast("long"))
      .select(col("custkey"), col("cnt"), col("share_micro"),
        col("n_keys"), col("max_cnt"), col("p95_cnt"), col("salt_factor"))
      .orderBy(col("cnt").desc, col("custkey"))
      .limit(10)
  }

  /** Identical count histogram, integer p95 threshold, ceil-div salt
    * factor, and one-division share. */
  val p27Sql: String =
    """WITH per_key AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS custkey, COUNT(*) AS cnt
      |  FROM orders GROUP BY 1),
      |tot AS (
      |  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |         MAX(cnt) AS max_cnt
      |  FROM per_key),
      |hist AS (SELECT cnt, COUNT(*) AS freq FROM per_key GROUP BY cnt),
      |cum AS (
      |  SELECT cnt, CAST(SUM(freq) OVER (ORDER BY cnt
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM hist),
      |p95 AS (
      |  SELECT MIN(cnt) AS p95_cnt FROM cum CROSS JOIN tot
      |  WHERE cum * 20 >= n_keys * 19),
      |thr AS (
      |  SELECT n_keys, n_rows, max_cnt, p95_cnt,
      |    (max_cnt + p95_cnt - 1) // p95_cnt AS salt_factor
      |  FROM tot CROSS JOIN p95)
      |SELECT custkey, cnt,
      |  CAST(FLOOR(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) * 1e6) AS BIGINT) AS share_micro,
      |  n_keys, max_cnt, p95_cnt, salt_factor
      |FROM per_key CROSS JOIN thr
      |WHERE cnt > p95_cnt
      |ORDER BY cnt DESC, custkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- p28
  /** Small-file COMPACTION PLAN — the lakehouse OPTIMIZE step: a table
    * that ingested micro-batches (st06's arrivals, p02's increments)
    * accumulates thousands of under-sized files per partition, and scan
    * cost degrades with per-file overhead; the fix is periodic
    * bin-packing of small files into target-sized groups WITHIN each
    * partition (locality: a compaction group never crosses the
    * partition boundary, or the rewrite would reshuffle data).
    *
    * Input manifest is simulated from the corpus (file per (source,
    * md5-hex bucket) with summed text bytes — the shape a real manifest
    * listing returns); the plan is the cumulative-bytes chop Delta/
    * Iceberg OPTIMIZE uses: files ordered deterministically within
    * their partition, group id = exclusive-prefix-bytes div target, so
    * every group lands within one file of the target. Distinct from
    * p23 (token-balanced TRAINING shards over a GLOBAL hash order, via
    * a two-level prefix sum): compaction is per-partition, so the
    * plain PARTITIONED window is already the scale-correct spelling —
    * state per window task is one partition's file list, never global.
    *
    * Output: one row per planned group with its fill ratio against the
    * target (exact integer milli) — the numbers an OPTIMIZE scheduler
    * thresholds on (skip partitions already compacted; alert on groups
    * chronically under-filled = partition smaller than one target
    * file).
    */
  def p28CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    val target = 20000L // bytes per compacted file
    val files = Tables.spread(Tables.documents(s, dir))
      .groupBy(col("source"),
        expr("conv(substring(md5(cast(doc_id as string)), 1, 1), 16, 10)").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text")).cast("long")).as("bytes"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val planned = files
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("grp", expr(s"(cum - bytes) div ${target}L"))
    planned.groupBy(col("source"), col("grp"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_docs")).as("n_docs"),
        sum(col("bytes")).as("group_bytes"))
      .withColumn("fill_milli", expr(s"(group_bytes * 1000) div ${target}L"))
      .orderBy(col("source"), col("grp"))
  }

  /** Identical manifest derivation, per-partition prefix sum, and
    * ceil-free chop arithmetic. */
  val p28Sql: String =
    """WITH files AS (
      |  SELECT source,
      |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1))::BIGINT AS bucket,
      |    COUNT(*) AS n_docs, CAST(SUM(LENGTH(text)) AS BIGINT) AS bytes
      |  FROM documents GROUP BY 1, 2),
      |planned AS (
      |  SELECT source, bucket, n_docs, bytes,
      |    CAST(SUM(bytes) OVER (PARTITION BY source ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - bytes AS prefix
      |  FROM files)
      |SELECT source, prefix // 20000 AS grp, COUNT(*) AS n_files,
      |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  CAST(SUM(bytes) AS BIGINT) AS group_bytes,
      |  (CAST(SUM(bytes) AS BIGINT) * 1000) // 20000 AS fill_milli
      |FROM planned GROUP BY 1, 2 ORDER BY source, grp""".stripMargin

  // ---------------------------------------------------------------- p29
  /** SQL `MERGE INTO` upsert — the lakehouse maintenance statement
    * itself, not a restatement: where p16 spells merge semantics as a
    * full-outer join and p20/p18 maintain SCD2/IVM state, p29 runs the
    * incremental corpus upsert through Catalyst's actual MERGE rewrite
    * against a V2 table ([[graft.sources.GraftLakeCatalog]], a
    * SupportsRowLevelOperations catalog with group-based copy-on-write).
    * All four action kinds in one statement:
    *
    *   WHEN MATCHED AND op='D'      THEN DELETE        (takedowns)
    *   WHEN MATCHED                 THEN UPDATE        (re-crawled docs)
    *   WHEN NOT MATCHED AND op<>'D' THEN INSERT        (new docs)
    *   WHEN NOT MATCHED BY SOURCE   THEN UPDATE        (stale marking)
    *
    * The changeset is derived deterministically from the corpus so the
    * oracle can re-derive it (p16's device): target = docs with
    * id % 10 <> 3 at ver 1; source = new docs (id % 10 = 3, op I),
    * takedowns (id % 7 = 0, op D), re-crawls (id % 5 = 0, op U, length
    * bumped by 1000 so the update is visible in the published state).
    * Published result: the ENTIRE post-merge table ordered by key, so
    * the oracle audits every carried-over, updated, inserted, deleted
    * and stale-marked row — DuckDB restates the statement as the
    * left-join + anti-join union (the engine-neutral relational core of
    * MERGE), which is exactly the cross-engine check the statement
    * needs: Spark's rewrite vs an independent relational spelling.
    *
    * Scale shape: Catalyst rewrites the statement into ONE outer join
    * between the table scan and the changeset plus a replacement write —
    * the same single-shuffle shape as p16, chosen by the engine rather
    * than hand-assembled. With a partition-grouped production catalog
    * (Delta/Iceberg), the same plan touches only affected partitions;
    * the whole-table group here is the local-store simplification, not a
    * property of the statement (see LakeCatalog.scala's scaling note).
    */
  def p29MergeInto(s: SparkSession, dir: String): DataFrame = {
    if (!s.conf.getOption("spark.sql.catalog.graft_lake").contains(
        classOf[graft.sources.GraftLakeCatalog].getName))
      s.conf.set("spark.sql.catalog.graft_lake",
        classOf[graft.sources.GraftLakeCatalog].getName)
    s.sql("DROP TABLE IF EXISTS graft_lake.corpus")
    s.sql("""CREATE TABLE graft_lake.corpus
            |(doc_id BIGINT, source STRING, len BIGINT, ver BIGINT, stale BIGINT)""".stripMargin)
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"), length(col("text")).cast(LongType).as("len"))
    docs.filter(col("doc_id") % 10 =!= 3)
      .select(col("doc_id"), col("source"), col("len"),
        lit(1L).as("ver"), lit(0L).as("stale"))
      .writeTo("graft_lake.corpus").append()
    docs.filter(col("doc_id") % 10 === 3 || col("doc_id") % 7 === 0 || col("doc_id") % 5 === 0)
      .withColumn("op",
        when(col("doc_id") % 7 === 0, "D")
          .when(col("doc_id") % 10 === 3, "I")
          .otherwise("U"))
      .createOrReplaceTempView("p29_updates")
    s.sql("""MERGE INTO graft_lake.corpus t
            |USING p29_updates s
            |ON t.doc_id = s.doc_id
            |WHEN MATCHED AND s.op = 'D' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET len = s.len + 1000, ver = 2, stale = 0
            |WHEN NOT MATCHED AND s.op <> 'D' THEN
            |  INSERT (doc_id, source, len, ver, stale) VALUES (s.doc_id, s.source, s.len, 2, 0)
            |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET stale = 1""".stripMargin)
    s.table("graft_lake.corpus").orderBy(col("doc_id"))
  }

  val p29Sql: String =
    """WITH d AS (SELECT doc_id, source, CAST(LENGTH(text) AS BIGINT) AS len FROM documents),
      |tgt AS (SELECT doc_id, source, len, CAST(1 AS BIGINT) AS ver FROM d WHERE doc_id % 10 <> 3),
      |src AS (
      |  SELECT doc_id, source, len,
      |    CASE WHEN doc_id % 7 = 0 THEN 'D'
      |         WHEN doc_id % 10 = 3 THEN 'I'
      |         ELSE 'U' END AS op
      |  FROM d WHERE doc_id % 10 = 3 OR doc_id % 7 = 0 OR doc_id % 5 = 0),
      |kept AS (
      |  SELECT t.doc_id, t.source,
      |    CASE WHEN s.doc_id IS NOT NULL THEN s.len + 1000 ELSE t.len END AS len,
      |    CASE WHEN s.doc_id IS NOT NULL THEN CAST(2 AS BIGINT) ELSE t.ver END AS ver,
      |    CASE WHEN s.doc_id IS NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS stale
      |  FROM tgt t LEFT JOIN src s USING (doc_id)
      |  WHERE s.doc_id IS NULL OR s.op <> 'D'),
      |ins AS (
      |  SELECT s.doc_id, s.source, s.len, CAST(2 AS BIGINT) AS ver, CAST(0 AS BIGINT) AS stale
      |  FROM src s LEFT JOIN tgt t USING (doc_id)
      |  WHERE t.doc_id IS NULL AND s.op <> 'D')
      |SELECT doc_id, source, len, ver, stale
      |FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- p30
  /** Audit-consumer GATE — the p-series capstone that closes the
    * measure-then-act loop: p27 measures the join-key skew profile and
    * derives the salt factor a q32-style treatment would need; this
    * operator CONSUMES that audit and APPLIES the decision in the same
    * plan, with no human (and no driver round-trip) in between. The
    * audit arithmetic is recomputed inline (p27's exact integer
    * histogram-p95 and ceil-div factor — shared spelling, so the
    * decision cannot drift from what p27 publishes), the decided factor
    * is joined in as a broadcast scalar, and the orders-customer join
    * runs SALTED BY THAT FACTOR: the build side replicates
    * `sequence(0, salt_factor - 1)` ways — the replication count comes
    * from the DATA at runtime, not from a hand-tuned constant — while
    * the probe side scatters with pmod(xxhash64(o_orderkey),
    * salt_factor). Published rows carry the applied decision
    * (salt_factor, p95_cnt, max_cnt, n_keys) alongside the join's
    * per-segment aggregate, and the oracle computes the PLAIN join with
    * the same audit columns — the cross-engine check is precisely
    * "salting with the gate's factor changed nothing but the
    * distribution".
    *
    * Honesty note: this testdata's o_custkey distribution is
    * near-uniform (max/p95 ~ 1.7 at sf0.01), so the gate decides a mild
    * factor of 2 and the measured before/after at sf0.1 is parity
    * (BENCH_NOTES.md) — the expected outcome on unskewed data. The
    * operator's value is the wiring: at the 100 TB tail, where one hot
    * key exceeds a task, the same plan re-derives the factor from the
    * actual distribution and levels the hot partition without a config
    * change.
    *
    * Plan shape at 100 TB: p27's bounded audit (per-key counts with
    * map-side combine, a count-VALUE histogram window, two broadcast
    * scalars) + one shuffle join whose build side grows by the small
    * decided factor. Nothing rescans orders twice.
    */
  def p30SaltGate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(s, dir)
    val perKey = orders
      .groupBy(col("o_custkey").cast("long").as("custkey"))
      .agg(count(lit(1)).as("cnt"))
    val hist = perKey.groupBy(col("cnt")).agg(count(lit(1)).as("freq"))
    // bounded-cardinality window over distinct count VALUES (p27/t20)
    val wcum = Window.orderBy(col("cnt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("freq")).over(wcum))
    val tot = perKey.agg(count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
    val p95 = cum.crossJoin(broadcast(tot))
      .filter(col("cum") * 20 >= col("n_keys") * 19)
      .agg(min(col("cnt")).as("p95_cnt"))
    val thr = tot.crossJoin(broadcast(p95))
      .withColumn("salt_factor", expr("(max_cnt + p95_cnt - 1) div p95_cnt"))
    val o = orders.crossJoin(broadcast(thr))
      .withColumn("salt", pmod(xxhash64(col("o_orderkey")), col("salt_factor")))
    val c = Tables.customer(s, dir)
      .crossJoin(broadcast(thr.select(col("salt_factor").as("sf_build"))))
      .withColumn("salt", explode(expr("sequence(0L, sf_build - 1L)")))
      .select(col("c_custkey"), col("c_mktsegment"), col("salt"))
    o.join(c, o("o_custkey") === c("c_custkey") && o("salt") === c("salt"))
      .groupBy(col("c_mktsegment"), col("salt_factor"), col("p95_cnt"),
        col("max_cnt"), col("n_keys"))
      .agg(count(lit(1)).as("n_orders"),
        Tables.dsum(col("o_totalprice"), 30, 2).as("total_price"))
      .select(col("c_mktsegment"), col("n_orders"), col("total_price"),
        col("salt_factor"), col("p95_cnt"), col("max_cnt"), col("n_keys"))
      .orderBy(col("c_mktsegment"))
  }

  /** The PLAIN join with the same audit columns: the gate's salting must
    * be result-invariant. */
  val p30Sql: String =
    """WITH per_key AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS custkey, COUNT(*) AS cnt
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n_keys, MAX(cnt) AS max_cnt FROM per_key),
      |hist AS (SELECT cnt, COUNT(*) AS freq FROM per_key GROUP BY cnt),
      |cum AS (
      |  SELECT cnt, CAST(SUM(freq) OVER (ORDER BY cnt
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM hist),
      |p95 AS (
      |  SELECT MIN(cnt) AS p95_cnt FROM cum CROSS JOIN tot
      |  WHERE cum * 20 >= n_keys * 19),
      |thr AS (
      |  SELECT n_keys, max_cnt, p95_cnt,
      |    (max_cnt + p95_cnt - 1) // p95_cnt AS salt_factor
      |  FROM tot CROSS JOIN p95)
      |SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS VARCHAR) AS DOUBLE) AS total_price,
      |  salt_factor, p95_cnt, max_cnt, n_keys
      |FROM orders JOIN customer ON o_custkey = c_custkey CROSS JOIN thr
      |GROUP BY c_mktsegment, salt_factor, p95_cnt, max_cnt, n_keys
      |ORDER BY c_mktsegment""".stripMargin

  private def registerLake(s: SparkSession): Unit =
    if (!s.conf.getOption("spark.sql.catalog.graft_lake").contains(
        classOf[graft.sources.GraftLakeCatalog].getName))
      s.conf.set("spark.sql.catalog.graft_lake",
        classOf[graft.sources.GraftLakeCatalog].getName)

  /** (Re)materialize the docs stats frame as a fresh lake table (per-run
    * idempotence: drop + create + one append commit). */
  private def lakeDocsTable(s: SparkSession, dir: String, table: String,
      extra: Seq[(String, org.apache.spark.sql.Column)] = Nil): Unit = {
    registerLake(s)
    s.sql(s"DROP TABLE IF EXISTS graft_lake.$table")
    val extraDdl = extra.map { case (n, _) => s", $n BIGINT" }.mkString
    s.sql(s"CREATE TABLE graft_lake.$table (doc_id BIGINT, source STRING, n_chars BIGINT$extraDdl)")
    extra.foldLeft(
        Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars"))) {
        case (df, (n, c)) => df.withColumn(n, c)
      }
      .writeTo(s"graft_lake.$table").append()
  }

  // ---------------------------------------------------------------- p31
  /** SQL `UPDATE` through the row-level-operation catalog — the
    * redaction statement (source-level takedown: null out the payload,
    * flag the row — the GDPR/compliance shape where the ROW must remain
    * as evidence but its content must go). Catalyst rewrites UPDATE for
    * a group-based table the same way as p29's MERGE: the row-level scan
    * + a conditional projection feeding ReplaceData — one distributed
    * pass, no driver-side row surgery. Published = the whole post-update
    * table; oracle = the CASE-projection restatement.
    */
  def p31SqlUpdate(s: SparkSession, dir: String): DataFrame = {
    lakeDocsTable(s, dir, "redact", Seq("redacted" -> lit(0L)))
    s.sql("""UPDATE graft_lake.redact
            |SET n_chars = 0, redacted = 1
            |WHERE source IN ('src3', 'src7')""".stripMargin)
    s.table("graft_lake.redact").orderBy(col("doc_id"))
  }

  val p31Sql: String =
    """SELECT doc_id, source,
      |  CASE WHEN source IN ('src3', 'src7') THEN 0 ELSE n_chars END AS n_chars,
      |  CASE WHEN source IN ('src3', 'src7') THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS redacted
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- p32
  /** SQL `DELETE FROM` through the row-level-operation catalog — the
    * retention statement (drop under-length docs and a deterministic
    * purge slice). Same group-based rewrite family as p29/p31
    * (RewriteDeleteFromTable -> ReplaceData over the filtered scan);
    * the oracle is the complement filter.
    */
  def p32SqlDelete(s: SparkSession, dir: String): DataFrame = {
    lakeDocsTable(s, dir, "retain")
    s.sql("""DELETE FROM graft_lake.retain
            |WHERE n_chars < 250 OR doc_id % 9 = 0""".stripMargin)
    s.table("graft_lake.retain").orderBy(col("doc_id"))
  }

  val p32Sql: String =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE NOT (n_chars < 250 OR doc_id % 9 = 0)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- p33
  /** Snapshot TIME TRAVEL (`VERSION AS OF`) — the lakehouse audit-trail
    * read: every committed write to a graft_lake table pushes an
    * immutable snapshot (v0 = empty at creation), and a version-pinned
    * scan reads table history exactly as Delta/Iceberg expose it. The
    * operator runs a 3-write maintenance chain on its own table (load ->
    * retention DELETE -> redaction UPDATE), then publishes the
    * per-version rollup (rows, chars, id checksum) by querying each
    * `VERSION AS OF v` — the before/after evidence a data-governance
    * review reads. Oracle: each version's state restated relationally
    * from the base table.
    */
  def p33TimeTravel(s: SparkSession, dir: String): DataFrame = {
    lakeDocsTable(s, dir, "history")
    s.sql("DELETE FROM graft_lake.history WHERE n_chars < 250")
    s.sql("""UPDATE graft_lake.history SET n_chars = 0
            |WHERE source = 'src5'""".stripMargin)
    (0 to 3).map { v =>
      s.sql(s"""SELECT CAST($v AS BIGINT) AS version, COUNT(*) AS n_rows,
               |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
               |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS sum_ids
               |FROM graft_lake.history VERSION AS OF $v""".stripMargin)
    }.reduce(_ unionAll _).orderBy(col("version"))
  }

  val p33Sql: String =
    """WITH v1 AS (SELECT doc_id, source, n_chars FROM documents),
      |v2 AS (SELECT * FROM v1 WHERE n_chars >= 250),
      |v3 AS (SELECT doc_id, source,
      |         CASE WHEN source = 'src5' THEN 0 ELSE n_chars END AS n_chars FROM v2)
      |SELECT CAST(0 AS BIGINT) AS version, 0 AS n_rows, CAST(0 AS BIGINT) AS sum_chars,
      |       CAST(0 AS BIGINT) AS sum_ids
      |UNION ALL
      |SELECT 1, COUNT(*), CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
      |       CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM v1
      |UNION ALL
      |SELECT 2, COUNT(*), CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
      |       CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM v2
      |UNION ALL
      |SELECT 3, COUNT(*), CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
      |       CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM v3
      |ORDER BY version""".stripMargin

  // ---------------------------------------------------------------- p34
  /** PARTITION-grouped MERGE with runtime group filtering — p29's upsert
    * on a `PARTITIONED BY (source)` lake table, where the changeset
    * touches only three sources: Catalyst's
    * RowLevelOperationRuntimeGroupFiltering executes the changeset side
    * first, pushes the touched partition values into the row-level scan
    * as a dynamic IN predicate, the scan emits ONLY those groups, and
    * the commit rewrites only them — the O(touched)-not-O(table)
    * copy-on-write contract that makes MERGE viable at 100 TB (p29's
    * whole-table group is the correct-but-full-rewrite baseline).
    *
    * The pruning claim is INSIDE the hash contract, not just a spec
    * assertion: the published per-source rollup carries a `rewritten`
    * flag read back from the commit's actual replaced-group set, and
    * the oracle computes that flag as `source IN (changeset sources)` —
    * if the engine ever rewrote more (or fewer) partitions than the
    * changeset touches, the row hashes diverge and the board goes red.
    *
    * Scenario per changeset source (src4/src9/src14), with action
    * classes keyed off the WITHIN-source row index (doc_id div 20 —
    * the testdata assigns source = doc_id % 20, so raw doc_id moduli
    * would degenerate per source): index % 5 = 0 takedowns (DELETE),
    * index % 4 = 1 new docs (INSERT — absent from the target by
    * construction), the rest re-crawls (UPDATE, n_chars bumped 1000) —
    * every changeset partition exercises all three clauses. Deliberately no NOT MATCHED BY SOURCE clause: that
    * clause semantically requires reading every group (any row might
    * need stale-marking), so Catalyst correctly disables group
    * filtering for it — p29 covers it on the whole-table group.
    */
  def p34PartitionedMerge(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.corpus_part")
    s.sql("""CREATE TABLE graft_lake.corpus_part
            |(doc_id BIGINT, source STRING, n_chars BIGINT, ver BIGINT)
            |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.filter(expr("(doc_id div 20) % 4") =!= 1)
      .withColumn("ver", lit(1L))
      .writeTo("graft_lake.corpus_part").append()
    docs.filter(col("source").isin("src4", "src9", "src14"))
      .withColumn("op",
        when(expr("(doc_id div 20) % 5") === 0, "D")
          .when(expr("(doc_id div 20) % 4") === 1, "I")
          .otherwise("U"))
      .createOrReplaceTempView("p34_updates")
    s.sql("""MERGE INTO graft_lake.corpus_part t
            |USING p34_updates s
            |ON t.doc_id = s.doc_id AND t.source = s.source
            |WHEN MATCHED AND s.op = 'D' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars + 1000, ver = 2
            |WHEN NOT MATCHED AND s.op <> 'D' THEN
            |  INSERT (doc_id, source, n_chars, ver) VALUES (s.doc_id, s.source, s.n_chars, 2)""".stripMargin)
    // the commit's ACTUAL replaced-group set, folded into the published
    // rollup — a k-partition driver-side read (the codebook contract)
    val rewritten = graft.sources.LakeStore.lastReplacedGroups
      .get("graft_lake.corpus_part").flatten.getOrElse(Set.empty)
      .map(_.head.asInstanceOf[String]).toSeq.sorted
    s.table("graft_lake.corpus_part")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(when(col("ver") === 2L, 1L).otherwise(0L)).as("n_ver2"))
      .withColumn("rewritten",
        when(col("source").isin(rewritten: _*), 1L).otherwise(0L))
      .orderBy(col("source"))
  }

  val p34Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |tgt AS (SELECT doc_id, source, n_chars, CAST(1 AS BIGINT) AS ver
      |        FROM d WHERE (doc_id // 20) % 4 <> 1),
      |src AS (
      |  SELECT doc_id, source, n_chars,
      |    CASE WHEN (doc_id // 20) % 5 = 0 THEN 'D'
      |         WHEN (doc_id // 20) % 4 = 1 THEN 'I'
      |         ELSE 'U' END AS op
      |  FROM d WHERE source IN ('src4', 'src9', 'src14')),
      |kept AS (
      |  SELECT t.doc_id, t.source,
      |    CASE WHEN s.doc_id IS NOT NULL THEN s.n_chars + 1000 ELSE t.n_chars END AS n_chars,
      |    CASE WHEN s.doc_id IS NOT NULL THEN CAST(2 AS BIGINT) ELSE t.ver END AS ver
      |  FROM tgt t LEFT JOIN src s ON t.doc_id = s.doc_id AND t.source = s.source
      |  WHERE s.doc_id IS NULL OR s.op <> 'D'),
      |ins AS (
      |  SELECT s.doc_id, s.source, s.n_chars, CAST(2 AS BIGINT) AS ver
      |  FROM src s LEFT JOIN tgt t ON s.doc_id = t.doc_id AND s.source = t.source
      |  WHERE t.doc_id IS NULL AND s.op <> 'D'),
      |merged AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CASE WHEN ver = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_ver2,
      |  CASE WHEN source IN ('src4', 'src9', 'src14')
      |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS rewritten
      |FROM merged GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p35
  /** Min/max ZONE-MAP data skipping at the lake scan — the Delta/Iceberg
    * file-statistics read path: documents land in a table `PARTITIONED
    * BY (batch)` where batch = ingestion order (doc_id div 50 — the
    * stand-in for time-ordered ingest files), and a range query on RAW
    * doc_id — NOT the partition column — is answered by consulting each
    * group's min/max zone before emitting anything. Because ingest order
    * correlates with doc_id, the zones are tight and the scan skips
    * every batch whose range cannot overlap [120, 269]; column pruning
    * simultaneously narrows the read to the two referenced columns.
    *
    * The skipping claim is INSIDE the hash contract: the published row
    * carries the scan's own counters (groups scanned of total, rows
    * emitted, columns read) next to the query answer, and the oracle
    * recomputes each from first principles — if the scan ever reads
    * more groups (skipping broken) or fewer (correctness broken, which
    * the answer columns would also catch), the hashes diverge. Skipping
    * is superset-safe by construction: every pushed predicate stays
    * residual, so Spark's Filter settles exact row semantics.
    *
    * At 100 TB this is THE scan lever: a 150-row id-range probe reads 4
    * of N ingest batches regardless of table size (4 of 10 groups at
    * sf0.01, 4 of 100 at sf0.1 — the skipped fraction GROWS with data).
    */
  def p35ZoneSkip(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.scan_skip")
    s.sql("""CREATE TABLE graft_lake.scan_skip
            |(doc_id BIGINT, source STRING, n_chars BIGINT, batch BIGINT)
            |PARTITIONED BY (batch)""".stripMargin)
    // one shuffle on the partition column before the write -> each task
    // owns whole batches -> exactly ONE file per batch group, so the
    // file zones ARE the batch zones at any scale factor (the standard
    // partition-aligned write; without it, upstream parallelism would
    // subdivide batches into files and the per-file skip counters would
    // depend on task layout instead of data)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("batch", expr("doc_id div 50"))
      .repartition(col("batch"))
      .writeTo("graft_lake.scan_skip").append()
    val agg = s.table("graft_lake.scan_skip")
      .filter(col("doc_id") >= 120L && col("doc_id") <= 269L)
      .agg(count(lit(1)).as("n_match"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
    agg.collect() // force the scan so its observed counters are readable
    val st = graft.sources.LakeStore.lastScanStats("graft_lake.scan_skip")
    agg.withColumn("groups_total", lit(st.groupsTotal.toLong))
      .withColumn("groups_scanned", lit(st.groupsScanned.toLong))
      .withColumn("rows_scanned", lit(st.rowsEmitted))
      .withColumn("n_cols_read", lit(st.colsRead.length.toLong))
  }

  val p35Sql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |m AS (SELECT * FROM d WHERE doc_id BETWEEN 120 AND 269),
      |sg AS (SELECT DISTINCT doc_id // 50 AS b FROM m),
      |stats AS (SELECT
      |  (SELECT COUNT(DISTINCT doc_id // 50) FROM d) AS groups_total,
      |  (SELECT COUNT(*) FROM sg) AS groups_scanned,
      |  (SELECT COUNT(*) FROM d WHERE doc_id // 50 IN (SELECT b FROM sg)) AS rows_scanned)
      |SELECT COUNT(*) AS n_match,
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
      |  CAST(groups_total AS BIGINT) AS groups_total,
      |  CAST(groups_scanned AS BIGINT) AS groups_scanned,
      |  CAST(rows_scanned AS BIGINT) AS rows_scanned,
      |  CAST(2 AS BIGINT) AS n_cols_read
      |FROM m CROSS JOIN stats
      |GROUP BY groups_total, groups_scanned, rows_scanned""".stripMargin

  // ---------------------------------------------------------------- p36
  /** Incremental CHANGES read from COMMIT METADATA — Delta's change
    * data feed / Iceberg's incremental scan, as a library call
    * ([[graft.sources.GraftLake.changes]]): every commit records which
    * partitions it touched, so "what changed between v1 and v2" is
    * planned from metadata alone (union the per-commit group sets) and
    * the diff reads ONLY those partitions of the two pinned snapshots —
    * the version-pinned scans carry a partition IN predicate the zone
    * maps skip on. The scenario is a maintenance window on a
    * source-partitioned corpus: retention DELETE in src3, re-crawl
    * UPDATE in src7 (both statically group-pruned off their own WHERE
    * clause), and a new-slice append into src11 — three commits, three
    * touched partitions of twenty.
    *
    * Published: per touched source, the classified change counts
    * (inserted / deleted / updated keys) from one distributed
    * full-outer join over the changed partitions only, plus the
    * metadata-derived changed-partition count against the live
    * partition total. The oracle pins groups_changed to EXACTLY the
    * three statement-touched sources — if any commit had recorded a
    * broader footprint (e.g. an unpruned UPDATE recording all 20
    * groups), the published count diverges and the board goes red:
    * the O(touched)-not-O(table) incremental contract is inside the
    * hash, not just asserted in a spec. */
  def p36IncrementalChanges(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.changes_inc")
    s.sql("""CREATE TABLE graft_lake.changes_inc
            |(doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.writeTo("graft_lake.changes_inc").append() // v1: initial load
    s.sql("DELETE FROM graft_lake.changes_inc WHERE source = 'src3' AND n_chars < 250") // v2
    s.sql("UPDATE graft_lake.changes_inc SET n_chars = n_chars + 1000 WHERE source = 'src7'") // v3
    docs.filter(col("source") === "src11")
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .writeTo("graft_lake.changes_inc").append() // v4: new crawl slice
    val key = "graft_lake.changes_inc"
    val changedN = graft.sources.GraftLake.changedPartitions(key, 1, 4)
      .map(_.size.toLong).getOrElse(-1L) // -1 = metadata forced a full diff
    val totalN = graft.sources.GraftLake.livePartitions(key).size.toLong
    graft.sources.GraftLake.changes(s, key, 1, 4, "doc_id")
      .groupBy(col("source"))
      .agg(sum(when(col("change") === "I", 1L).otherwise(0L)).as("n_ins"),
        sum(when(col("change") === "D", 1L).otherwise(0L)).as("n_del"),
        sum(when(col("change") === "U", 1L).otherwise(0L)).as("n_upd"))
      .withColumn("groups_changed", lit(changedN))
      .withColumn("groups_total", lit(totalN))
      .orderBy(col("source"))
  }

  val p36Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |ch AS (
      |  SELECT source, 0 AS i, 1 AS dl, 0 AS u FROM d
      |  WHERE source = 'src3' AND n_chars < 250
      |  UNION ALL
      |  SELECT source, 0, 0, 1 FROM d WHERE source = 'src7'
      |  UNION ALL
      |  SELECT source, 1, 0, 0 FROM d WHERE source = 'src11')
      |SELECT source, CAST(SUM(i) AS BIGINT) AS n_ins,
      |  CAST(SUM(dl) AS BIGINT) AS n_del, CAST(SUM(u) AS BIGINT) AS n_upd,
      |  CAST(3 AS BIGINT) AS groups_changed,
      |  (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM d) AS groups_total
      |FROM ch GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p37
  /** Lake SCHEMA EVOLUTION — `ALTER TABLE ADD COLUMN` + MERGE into the
    * evolved schema (Delta's automatic-evolution scenario, done with the
    * explicit DDL): the corpus lands in a source-partitioned lake table,
    * a `quality_milli` column is added as a METADATA-ONLY commit (no
    * file is touched — dataChange=false, same live set), and a MERGE
    * back-fills quality for the re-scored slice while inserting a new
    * crawl slice that carries the column from birth. Files written
    * before the ALTER physically lack the column; the scan pads null
    * from the manifest's per-file column list — the mergeSchema read
    * behavior without opening a single extra footer.
    *
    * The evolution contract sits INSIDE the hash: per source, the count
    * of rows whose quality is NULL (exactly the never-rescored pre-ALTER
    * rows), the exact int64 quality sum over back-filled + inserted
    * rows, and the v1 time-travel column count (pre-ALTER snapshots
    * surface their own 3-column schema, like Delta). */
  def p37SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.evo")
    s.sql("""CREATE TABLE graft_lake.evo
            |(doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.writeTo("graft_lake.evo").append() // v1: pre-evolution corpus
    s.sql("ALTER TABLE graft_lake.evo ADD COLUMN quality_milli BIGINT") // v2: metadata-only
    val rescored = docs.filter(col("doc_id") % 5 === 0)
      .withColumn("quality_milli", col("n_chars") * 3L)
    val newSlice = docs.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"),
        lit("src_new").as("source"), lit(77L).as("n_chars"),
        lit(1234L).as("quality_milli"))
    rescored.unionByName(newSlice).createOrReplaceTempView("evo_changes")
    s.sql("""MERGE INTO graft_lake.evo t USING evo_changes s
            |ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN UPDATE SET quality_milli = s.quality_milli
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin) // v3
    val v1Cols = s.sql("SELECT * FROM graft_lake.evo VERSION AS OF 1")
      .schema.length.toLong
    s.table("graft_lake.evo")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("quality_milli").isNull, 1L).otherwise(0L)).as("n_null_q"),
        coalesce(sum(col("quality_milli")), lit(0L)).as("sum_q"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("n_cols_v1", lit(v1Cols))
      .orderBy(col("source"))
  }

  val p37Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |merged AS (
      |  SELECT doc_id, source, n_chars,
      |    CASE WHEN doc_id % 5 = 0 THEN n_chars * 3 ELSE NULL END AS q
      |  FROM d
      |  UNION ALL
      |  SELECT doc_id + 10000, 'src_new', 77, 1234 FROM d WHERE doc_id % 97 = 0)
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN q IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_q,
      |  CAST(SUM(COALESCE(q, 0)) AS BIGINT) AS sum_q,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(3 AS BIGINT) AS n_cols_v1
      |FROM merged GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p38
  /** OPTIMIZE executed — the compaction/clustering plans (p28 bin-packs,
    * q94 audits Z-order) wired to the lake as a real layout rewrite
    * ([[graft.sources.GraftLake.optimize]]): the corpus arrives as 8
    * ingestion-sliced commits whose files all span the full `n_chars`
    * range (every box predicate must open every file — the classic
    * unclustered-ingest pathology), then one distributed range-shuffle
    * rewrites the live set into 4 files range-CLUSTERED on n_chars.
    * The commit is dataChange=false: time travel still sees every prior
    * version and CDC readers see NO change — Delta's OPTIMIZE contract.
    *
    * The layout claim sits INSIDE the hash via the scan's own counters
    * around the SAME box query run before and after: files_scanned
    * before is restated from first principles (a slice's file survives
    * iff its n_chars range overlaps the box), `improved` pins that the
    * clustered layout opens strictly fewer files, `answer_*` pins that
    * OPTIMIZE changed no data, and `cdc_rows` pins invisibility to the
    * incremental reader. At 100 TB this is THE compaction lever: the
    * same box probe goes from O(all ingest files) to O(overlapping
    * ranges) with zero change to the query. */
  def p38OptimizeLayout(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.opt")
    s.sql("CREATE TABLE graft_lake.opt (doc_id BIGINT, source STRING, n_chars BIGINT)")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    (0 until 8).foreach { slice => // 8 ingest commits, one file each
      docs.filter(col("doc_id") % 8 === slice).coalesce(1)
        .writeTo("graft_lake.opt").append()
    }
    def boxQuery() = s.table("graft_lake.opt")
      .filter(col("n_chars") >= 200L && col("n_chars") <= 260L)
      .agg(count(lit(1)).as("n_match"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
    val beforeAnswer = boxQuery().collect()(0)
    val before = graft.sources.LakeStore.lastScanStats("graft_lake.opt")
    val vBefore = graft.sources.GraftLake.latestVersion("graft_lake.opt")
    graft.sources.GraftLake.optimize(s, "graft_lake.opt", "n_chars", nFiles = 4)
    val out = boxQuery()
    val afterAnswer = out.collect()(0)
    val after = graft.sources.LakeStore.lastScanStats("graft_lake.opt")
    val vAfter = graft.sources.GraftLake.latestVersion("graft_lake.opt")
    // OPTIMIZE is invisible to the incremental reader (dataChange=false)
    val cdcRows = graft.sources.GraftLake
      .changes(s, "graft_lake.opt", vBefore, vAfter, "doc_id").count()
    out
      .withColumn("files_total_before", lit(before.filesTotal.toLong))
      .withColumn("files_scanned_before", lit(before.filesScanned.toLong))
      .withColumn("files_total_after", lit(after.filesTotal.toLong))
      .withColumn("improved",
        lit(if (after.filesScanned < before.filesScanned) 1L else 0L))
      .withColumn("answer_stable",
        lit(if (beforeAnswer == afterAnswer) 1L else 0L))
      .withColumn("cdc_rows", lit(cdcRows))
  }

  val p38Sql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |sl AS (SELECT doc_id % 8 AS s, MIN(n_chars) AS mn, MAX(n_chars) AS mx
      |       FROM d GROUP BY 1),
      |m AS (SELECT * FROM d WHERE n_chars BETWEEN 200 AND 260)
      |SELECT COUNT(*) AS n_match,
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
      |  CAST(8 AS BIGINT) AS files_total_before,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sl
      |   WHERE mn <= 260 AND mx >= 200) AS files_scanned_before,
      |  CAST(4 AS BIGINT) AS files_total_after,
      |  CAST(1 AS BIGINT) AS improved,
      |  CAST(1 AS BIGINT) AS answer_stable,
      |  CAST(0 AS BIGINT) AS cdc_rows
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- p39
  /** VACUUM retention — the lake's physical cleanup (Delta VACUUM): the
    * corpus arrives as 4 single-file ingest commits, a retention DELETE
    * copy-on-writes the live set into fresh files (the 4 ingest files
    * stay on disk, referenced only by history), then VACUUM with
    * retain-last-1 deletes exactly those 4 now-unreferenced files and
    * gates time travel before the horizon. The invariants sit INSIDE
    * the hash: files_deleted is exactly the ingest-file count (live
    * rewrite files are never touched — deleting one would break the
    * live read whose answer is also in the row), disk==live pins that
    * nothing unreferenced survives, and old_blocked pins the loud
    * retention gate (a vacuumed version must error, not half-read).
    *
    * At 100 TB this is the storage-cost closer of the maintenance
    * loop: MERGE/DELETE/OPTIMIZE all write new files and strand old
    * ones behind time travel; VACUUM is what actually returns bytes,
    * and the keep-set rule (union of retained snapshots' manifests,
    * never "older than the live set") is the correctness line this row
    * hash-pins. */
  def p39VacuumRetention(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.vac")
    s.sql("CREATE TABLE graft_lake.vac (doc_id BIGINT, source STRING, n_chars BIGINT)")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    (0 until 4).foreach { slice => // v1..v4: one ingest file each
      docs.filter(col("doc_id") % 4 === slice).coalesce(1)
        .writeTo("graft_lake.vac").append()
    }
    s.sql("DELETE FROM graft_lake.vac WHERE n_chars < 250") // v5: COW rewrite
    val (deleted, horizon) = graft.sources.GraftLake.vacuum("graft_lake.vac", retainLast = 1)
    // disk must now hold exactly the live manifest's files
    val st = graft.sources.LakeStore.get("graft_lake.vac").get
    val fs = new org.apache.hadoop.fs.Path(graft.sources.LakeStore.dataDir("graft_lake.vac"))
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(
      graft.sources.LakeStore.dataDir("graft_lake.vac")))
      .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    val diskEqualsLive = if (onDisk == st.current.map(_.path).toSet) 1L else 0L
    val oldBlocked =
      try { s.sql("SELECT * FROM graft_lake.vac VERSION AS OF 4").collect(); 0L }
      catch { case _: Exception => 1L }
    s.table("graft_lake.vac")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
      .withColumn("files_deleted", lit(deleted.toLong))
      .withColumn("horizon", lit(horizon.toLong))
      .withColumn("disk_equals_live", lit(diskEqualsLive))
      .withColumn("old_blocked", lit(oldBlocked))
  }

  val p39Sql: String =
    """WITH live AS (SELECT doc_id, n_chars FROM documents WHERE n_chars >= 250)
      |SELECT COUNT(*) AS n_rows,
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
      |  CAST(4 AS BIGINT) AS files_deleted,
      |  CAST(5 AS BIGINT) AS horizon,
      |  CAST(1 AS BIGINT) AS disk_equals_live,
      |  CAST(1 AS BIGINT) AS old_blocked
      |FROM live""".stripMargin

  // ---------------------------------------------------------------- p40
  /** RESTORE — roll the table back to a known-good snapshot as a NEW
    * commit (Delta's `RESTORE TABLE ... TO VERSION AS OF`): the corpus
    * loads (v1), a bad re-score UPDATEs one source and a bad retention
    * job DELETEs part of another (v2, v3), and one restore undoes both.
    * The restore is a MANIFEST move — the v1 files are re-pointed, not
    * copied (p38/p33 keep them on disk; Round9bOpsSpec pins zero new
    * data files) — and history stays append-only: v2/v3 remain
    * inspectable behind VERSION AS OF.
    *
    * The undo contract sits INSIDE the hash: the restored table's
    * aggregates are restated from the pristine corpus, `match_v1` pins
    * a checksum tie to the v1 time-travel read, and the CDC counts of
    * the restore commit classify the undo row-by-row — the deleted
    * slice comes back as inserts, the re-scored source reverts as
    * updates, nothing else moves. `groups_touched` pins the commit's
    * metadata footprint to exactly the two damaged partitions, so an
    * incremental reader consumes the restore as the O(touched) diff it
    * is — at 100 TB a restore is a pure metadata operation regardless
    * of table size. */
  def p40RestoreVersion(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.restore_demo")
    s.sql("""CREATE TABLE graft_lake.restore_demo
            |(doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.writeTo("graft_lake.restore_demo").append() // v1: good state
    s.sql("UPDATE graft_lake.restore_demo SET n_chars = n_chars + 5000 WHERE source = 'src5'") // v2
    s.sql("DELETE FROM graft_lake.restore_demo WHERE source = 'src2' AND n_chars < 300") // v3
    graft.sources.GraftLake.restore("graft_lake.restore_demo", 1) // v4: undo both
    def sig(df: DataFrame) = df.agg(
      count(lit(1)), coalesce(sum(col("n_chars")), lit(0L)),
      coalesce(sum(col("doc_id") * col("n_chars")), lit(0L))).collect()(0)
    val matchV1 = if (sig(s.table("graft_lake.restore_demo")) ==
      sig(s.sql("SELECT * FROM graft_lake.restore_demo VERSION AS OF 1"))) 1L else 0L
    val nVersions = graft.sources.GraftLake.latestVersion("graft_lake.restore_demo").toLong
    val groupsTouched = graft.sources.GraftLake
      .changedPartitions("graft_lake.restore_demo", 3, 4)
      .map(_.size.toLong).getOrElse(-1L) // -1 = metadata forced a full diff
    val cdc = graft.sources.GraftLake.changes(s, "graft_lake.restore_demo", 3, 4, "doc_id")
      .agg(sum(when(col("change") === "I", 1L).otherwise(0L)).as("n_back_ins"),
        sum(when(col("change") === "U", 1L).otherwise(0L)).as("n_back_upd"),
        sum(when(col("change") === "D", 1L).otherwise(0L)).as("n_back_del"))
    s.table("graft_lake.restore_demo")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
      .crossJoin(broadcast(cdc)) // 1-row scalar frame, not a cartesian
      .withColumn("match_v1", lit(matchV1))
      .withColumn("n_versions", lit(nVersions))
      .withColumn("groups_touched", lit(groupsTouched))
  }

  val p40Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents)
      |SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  (SELECT COUNT(*) FROM d WHERE source = 'src2' AND n_chars < 300) AS n_back_ins,
      |  (SELECT COUNT(*) FROM d WHERE source = 'src5') AS n_back_upd,
      |  CAST(0 AS BIGINT) AS n_back_del,
      |  CAST(1 AS BIGINT) AS match_v1,
      |  CAST(4 AS BIGINT) AS n_versions,
      |  CAST(2 AS BIGINT) AS groups_touched
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- p41
  /** METADATA TABLES — the manifest queryable as SQL (Iceberg's
    * `<table>.history` / `<table>.files`, Delta's DESCRIBE HISTORY):
    * plain `SELECT`s over identifier-suffixed tables answer "what
    * happened to this table" and "what does it physically hold" from
    * COMMIT METADATA alone — no data file is opened anywhere in this
    * query's read side. The scenario makes every number deterministic:
    * two group-aligned appends (repartition on the partition column →
    * exactly one file per source per commit) and a whole-partition
    * DELETE (which the SupportsDeleteV2 gate lands as a METADATA-ONLY
    * `delete` commit — p74's operator, visible here in the history
    * action), then the history aggregates per action (commit counts,
    * files/rows added and removed, data-change flags) and the files
    * table's live footprint (file/row/group counts) are all restated
    * by the oracle from the corpus itself.
    *
    * The scale story IS the point: history and files rows are the
    * driver-side snapshot state Delta/Iceberg already hold (KB per
    * thousand files), so the scan is one honest metadata partition
    * while the data it describes can be 100 TB. */
  def p41MetadataTables(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.meta_demo")
    s.sql("""CREATE TABLE graft_lake.meta_demo
            |(doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.repartition(col("source"))
      .writeTo("graft_lake.meta_demo").append() // v1: one file per source
    docs.filter(col("doc_id") % 13 === 0)
      .withColumn("doc_id", col("doc_id") + 500000L)
      .repartition(col("source"))
      .writeTo("graft_lake.meta_demo").append() // v2: re-crawl slice
    s.sql("DELETE FROM graft_lake.meta_demo WHERE source = 'src3'") // v3: drop a partition
    val files = s.sql(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_live_files,
        |  CAST(COALESCE(SUM(rows), 0) AS BIGINT) AS n_live_rows,
        |  CAST(COUNT(DISTINCT partition) AS BIGINT) AS n_live_groups
        |FROM graft_lake.meta_demo.files""".stripMargin)
    s.sql(
      """SELECT action, COUNT(*) AS n_commits,
        |  SUM(files_added) AS files_added, SUM(files_removed) AS files_removed,
        |  SUM(rows_added) AS rows_added, SUM(rows_removed) AS rows_removed,
        |  SUM(CASE WHEN data_change THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS n_data_change
        |FROM graft_lake.meta_demo.history GROUP BY action""".stripMargin)
      .crossJoin(broadcast(files)) // 1-row scalar frame
      .orderBy(col("action"))
  }

  val p41Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |sl AS (SELECT doc_id + 500000 AS doc_id, source, n_chars FROM d WHERE doc_id % 13 = 0),
      |hist AS (
      |  SELECT 'append' AS action, CAST(2 AS BIGINT) AS n_commits,
      |    CAST((SELECT COUNT(DISTINCT source) FROM d) +
      |         (SELECT COUNT(DISTINCT source) FROM sl) AS BIGINT) AS files_added,
      |    CAST(0 AS BIGINT) AS files_removed,
      |    CAST((SELECT COUNT(*) FROM d) + (SELECT COUNT(*) FROM sl) AS BIGINT) AS rows_added,
      |    CAST(0 AS BIGINT) AS rows_removed,
      |    CAST(2 AS BIGINT) AS n_data_change
      |  UNION ALL
      |  SELECT 'create', 1, 0, 0, 0, 0, 0
      |  UNION ALL
      |  SELECT 'delete', 1, 0,
      |    CAST(1 + (SELECT CASE WHEN COUNT(*) > 0 THEN 1 ELSE 0 END
      |              FROM sl WHERE source = 'src3') AS BIGINT),
      |    0,
      |    CAST((SELECT COUNT(*) FROM d WHERE source = 'src3') +
      |         (SELECT COUNT(*) FROM sl WHERE source = 'src3') AS BIGINT),
      |    1),
      |lv AS (SELECT * FROM d WHERE source <> 'src3'
      |       UNION ALL SELECT * FROM sl WHERE source <> 'src3'),
      |f AS (SELECT
      |  CAST((SELECT COUNT(DISTINCT source) FROM d WHERE source <> 'src3') +
      |       (SELECT COUNT(DISTINCT source) FROM sl WHERE source <> 'src3') AS BIGINT) AS n_live_files,
      |  CAST((SELECT COUNT(*) FROM lv) AS BIGINT) AS n_live_rows,
      |  CAST((SELECT COUNT(DISTINCT source) FROM lv) AS BIGINT) AS n_live_groups)
      |SELECT action, n_commits, files_added, files_removed, rows_added,
      |  rows_removed, n_data_change, n_live_files, n_live_rows, n_live_groups
      |FROM hist CROSS JOIN f ORDER BY action""".stripMargin

  /** Run a statement EXPECTED to fail (enforcement probes: constraint
    * violations, generated-value mismatches, identity explicit inserts)
    * with executor logging silenced for its duration — the intentional
    * task abort otherwise prints a full ERROR stack into the bench/
    * verify tail, burying real failures. Returns 1 when it failed (the
    * expected outcome), 0 when it unexpectedly succeeded. */
  private def expectBlocked(s: SparkSession)(body: => Unit): Long = {
    val sc = s.sparkContext
    sc.setLogLevel("OFF")
    try { body; 0L }
    catch { case _: Exception => 1L }
    finally sc.setLogLevel("WARN")
  }

  // ---------------------------------------------------------------- p42
  /** CHECK CONSTRAINTS — data-quality enforcement AT THE STORAGE LAYER
    * (Delta's `ALTER TABLE ... ADD CONSTRAINT ... CHECK`, stored as
    * `graft.constraints.*` table properties exactly like Delta's
    * `delta.constraints.*`): two constraints attach as a metadata-only
    * commit, a clean load passes, and then every way bad data could
    * sneak in is tried and must fail LOUDLY with nothing committed — a
    * violating append, a violating UPDATE (the row-level rewrite
    * funnels through the same task-side writer, so no path bypasses
    * the check), and adding a new constraint the existing rows already
    * violate (rejected by the add-time validation scan).
    *
    * Enforcement is a bound Catalyst predicate compiled once per task
    * and evaluated per row — the 100 TB path adds no shuffle, no
    * driver round-trip, and no second pass; the add-time validation is
    * one distributed count. The hash pins the surviving table (only
    * the clean load), both blocked flags, the rejected-constraint
    * flag, the live constraint count, and version stability (failed
    * writes must not advance the log). */
  def p42CheckConstraints(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.cons")
    s.sql("CREATE TABLE graft_lake.cons (doc_id BIGINT, source STRING, n_chars BIGINT)")
    s.sql("""ALTER TABLE graft_lake.cons SET TBLPROPERTIES (
            |  'graft.constraints.chars_positive' = 'n_chars > 0',
            |  'graft.constraints.id_bounded' = 'doc_id < 1000000')""".stripMargin) // v2
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.writeTo("graft_lake.cons").append() // v3: every row satisfies both
    val vBefore = graft.sources.GraftLake.latestVersion("graft_lake.cons").toLong
    val insertBlocked = expectBlocked(s) {
      docs.limit(3).withColumn("n_chars", lit(-5L))
        .writeTo("graft_lake.cons").append()
    }
    val updateBlocked = expectBlocked(s) {
      s.sql("UPDATE graft_lake.cons SET n_chars = -1 WHERE doc_id % 100 = 0")
    }
    val badRejected = try {
      s.sql("""ALTER TABLE graft_lake.cons SET TBLPROPERTIES (
              |  'graft.constraints.impossible' = 'n_chars > 100000')""".stripMargin); 0L
    } catch { case _: Exception => 1L }
    val nConstraints = graft.sources.LakeStore.get("graft_lake.cons").get
      .props.keys.count(_.startsWith("graft.constraints.")).toLong
    val versionStable =
      if (graft.sources.GraftLake.latestVersion("graft_lake.cons").toLong == vBefore) 1L
      else 0L
    s.table("graft_lake.cons")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
      .withColumn("n_constraints", lit(nConstraints))
      .withColumn("insert_blocked", lit(insertBlocked))
      .withColumn("update_blocked", lit(updateBlocked))
      .withColumn("bad_constraint_rejected", lit(badRejected))
      .withColumn("version_stable", lit(versionStable))
  }

  val p42Sql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(2 AS BIGINT) AS n_constraints,
      |  CAST(1 AS BIGINT) AS insert_blocked,
      |  CAST(1 AS BIGINT) AS update_blocked,
      |  CAST(1 AS BIGINT) AS bad_constraint_rejected,
      |  CAST(1 AS BIGINT) AS version_stable
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- p43
  /** Shallow CLONE — a zero-copy table fork (Delta's `CREATE TABLE ...
    * SHALLOW CLONE`): the clone's first commit REFERENCES the source's
    * current files absolutely, carrying their manifest stats (zones,
    * row counts, groups) for free, and from then on the two tables
    * diverge independently under copy-on-write — the dev/staging-fork
    * move that makes "experiment on a 100 TB table" a METADATA
    * operation. The scenario diverges both sides: the source drops a
    * partition (its COW leaves the referenced file on disk, exactly
    * like time travel), the clone ingests a new slice and re-scores one
    * source (its rewrite lands in its OWN data dir, leaving the shared
    * file untouched for the source).
    *
    * Inside the hash: both tables' post-divergence aggregates (each
    * restated from the corpus), `zero_copy` pinning that the clone's
    * data dir held ZERO parquet files at clone time, and
    * `shared_files` pinning that after divergence the clone still
    * references exactly the untouched source files (one per source
    * group minus the one it rewrote). */
  def p43ShallowClone(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.clone_dst")
    s.sql("DROP TABLE IF EXISTS graft_lake.clone_src")
    s.sql("""CREATE TABLE graft_lake.clone_src
            |(doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.repartition(col("source"))
      .writeTo("graft_lake.clone_src").append() // one file per source
    graft.sources.GraftLake.shallowClone("graft_lake.clone_src", "graft_lake.clone_dst")
    // zero-copy: the clone's own data dir holds no parquet at clone time
    val fs = new org.apache.hadoop.fs.Path(
      graft.sources.LakeStore.dataDir("graft_lake.clone_dst"))
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val zeroCopy = if (fs.listStatus(new org.apache.hadoop.fs.Path(
        graft.sources.LakeStore.dataDir("graft_lake.clone_dst")))
        .count(_.getPath.getName.endsWith(".parquet")) == 0) 1L else 0L
    // diverge the SOURCE: retention drops a partition
    s.sql("DELETE FROM graft_lake.clone_src WHERE source = 'src4'")
    // diverge the CLONE: new crawl slice + a re-score in one source
    docs.filter(col("doc_id") % 31 === 0)
      .withColumn("doc_id", col("doc_id") + 700000L)
      .repartition(col("source"))
      .writeTo("graft_lake.clone_dst").append()
    s.sql("UPDATE graft_lake.clone_dst SET n_chars = n_chars + 7 WHERE source = 'src6'")
    // the clone's live set still references the untouched source files
    val sharedFiles = graft.sources.LakeStore.get("graft_lake.clone_dst").get
      .current.count(_.path.startsWith("/")).toLong
    val srcAgg = s.table("graft_lake.clone_src")
      .agg(count(lit(1)).as("src_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("src_sum"))
    s.table("graft_lake.clone_dst")
      .agg(count(lit(1)).as("dst_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("dst_sum"))
      .crossJoin(broadcast(srcAgg)) // 1-row scalar frame
      .withColumn("zero_copy", lit(zeroCopy))
      .withColumn("shared_files", lit(sharedFiles))
  }

  val p43Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |sl AS (SELECT doc_id + 700000 AS doc_id, source, n_chars FROM d WHERE doc_id % 31 = 0)
      |SELECT
      |  (SELECT COUNT(*) FROM d) + (SELECT COUNT(*) FROM sl) AS dst_rows,
      |  CAST((SELECT SUM(n_chars) FROM d) + (SELECT COALESCE(SUM(n_chars), 0) FROM sl)
      |    + 7 * ((SELECT COUNT(*) FROM d WHERE source = 'src6')
      |         + (SELECT COUNT(*) FROM sl WHERE source = 'src6')) AS BIGINT) AS dst_sum,
      |  (SELECT COUNT(*) FROM d WHERE source <> 'src4') AS src_rows,
      |  CAST((SELECT SUM(n_chars) FROM d WHERE source <> 'src4') AS BIGINT) AS src_sum,
      |  CAST(1 AS BIGINT) AS zero_copy,
      |  CAST((SELECT COUNT(DISTINCT source) FROM d) - 1 AS BIGINT) AS shared_files""".stripMargin

  // ---------------------------------------------------------------- p44
  /** MERGE-ON-READ row-level operations — deletion vectors (Iceberg v2
    * position deletes / Delta DVs) through Catalyst's own WriteDelta
    * planning: the table opts in with `TBLPROPERTIES
    * ('graft.merge-on-read' = 'true')`, and then DELETE, UPDATE, and a
    * three-clause MERGE each commit as position-delete sidecars + new
    * data files while EVERY original data file stays live and untouched
    * — the cost model a 100 TB maintenance loop needs (a retention
    * DELETE costs O(deleted positions), never a group rewrite; scans
    * pay a bounded merge). The scan's `(_file, _pos)` metadata columns
    * are the rowId contract; deleted positions cannot re-match; CDC,
    * time travel, OPTIMIZE (which compacts through DVs and purges
    * them), and VACUUM all compose — Round9bOpsSpec pins each.
    *
    * Inside the hash: the final table state after DELETE → UPDATE →
    * MERGE (restated relationally), the LIVE deletion-vector position
    * total (every hidden row accounted), `orig_intact` pinning that not
    * one v1 data file left the live set, and the v1→v4 CDC classified
    * counts (reinserted-unchanged rows correctly absent). */
  def p44MergeOnRead(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.mor")
    s.sql("""CREATE TABLE graft_lake.mor
            |(doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (source)
            |TBLPROPERTIES ('graft.merge-on-read' = 'true')""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.repartition(col("source"))
      .writeTo("graft_lake.mor").append() // v1: one file per source
    val v1Files = graft.sources.LakeStore.get("graft_lake.mor").get
      .current.map(_.path).toSet
    s.sql("DELETE FROM graft_lake.mor WHERE n_chars < 250") // v2: pure-DV retention
    s.sql("UPDATE graft_lake.mor SET n_chars = n_chars + 100 WHERE source = 'src8'") // v3
    docs.filter(col("doc_id") % 41 === 0)
      .unionByName(docs.filter(col("doc_id") % 53 === 0)
        .select((col("doc_id") + 900000L).as("doc_id"), col("source"),
          lit(333L).as("n_chars")))
      .createOrReplaceTempView("mor_changes")
    s.sql("""MERGE INTO graft_lake.mor t USING mor_changes s ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN UPDATE SET n_chars = t.n_chars + 1
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin) // v4
    val st = graft.sources.LakeStore.get("graft_lake.mor").get
    val origIntact = if (v1Files.subsetOf(st.current.map(_.path).toSet)) 1L else 0L
    val dvRows = st.deletes.map(_.rows).sum
    val cdc = graft.sources.GraftLake.changes(s, "graft_lake.mor", 1, 4, "doc_id")
      .agg(sum(when(col("change") === "I", 1L).otherwise(0L)).as("n_cdc_ins"),
        sum(when(col("change") === "U", 1L).otherwise(0L)).as("n_cdc_upd"),
        sum(when(col("change") === "D", 1L).otherwise(0L)).as("n_cdc_del"))
    s.table("graft_lake.mor")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
      .crossJoin(broadcast(cdc)) // 1-row scalar frame
      .withColumn("dv_rows", lit(dvRows))
      .withColumn("orig_intact", lit(origIntact))
      .withColumn("n_versions", lit(st.latestVersion.toLong))
  }

  val p44Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |live AS (
      |  SELECT doc_id, source,
      |    n_chars + (CASE WHEN source = 'src8' THEN 100 ELSE 0 END)
      |            + (CASE WHEN doc_id % 41 = 0 THEN 1 ELSE 0 END) AS n_chars
      |  FROM d WHERE n_chars >= 250
      |  UNION ALL
      |  SELECT doc_id, source, n_chars FROM d WHERE n_chars < 250 AND doc_id % 41 = 0
      |  UNION ALL
      |  SELECT doc_id + 900000, source, 333 FROM d WHERE doc_id % 53 = 0)
      |SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  (SELECT COUNT(*) FROM d WHERE doc_id % 53 = 0) AS n_cdc_ins,
      |  (SELECT COUNT(*) FROM d WHERE n_chars >= 250
      |     AND (source = 'src8' OR doc_id % 41 = 0)) AS n_cdc_upd,
      |  (SELECT COUNT(*) FROM d WHERE n_chars < 250 AND doc_id % 41 <> 0) AS n_cdc_del,
      |  CAST((SELECT COUNT(*) FROM d WHERE n_chars < 250)
      |     + (SELECT COUNT(*) FROM d WHERE source = 'src8' AND n_chars >= 250)
      |     + (SELECT COUNT(*) FROM d WHERE doc_id % 41 = 0 AND n_chars >= 250)
      |     AS BIGINT) AS dv_rows,
      |  CAST(1 AS BIGINT) AS orig_intact,
      |  CAST(4 AS BIGINT) AS n_versions
      |FROM live""".stripMargin

  // ---------------------------------------------------------------- p45
  /** Column DEFAULTs + GENERATED + IDENTITY columns — Spark 4's native
    * DSv2 DDL surface, opted into via the catalog capabilities and
    * persisted through the commit log as StructField metadata: a
    * `DEFAULT` fills omitted INSERT columns in the ANALYZER (zero write-
    * path cost — the standard ingestion-hygiene move: late-arriving
    * feeds omit the columns the pipeline backfills); a `GENERATED
    * ALWAYS AS (expr)` column is COMPUTED task-side when omitted and
    * VALIDATED (null-safe equality, loud abort) when provided — Delta's
    * generated-column contract through p42's bound-expression path; an
    * `IDENTITY` column is writer-assigned off a manifest-zone high-water
    * mark — no coordination service, no extra commit, per-task value
    * blocks, Delta's stated guarantees (unique, monotone per job, NOT
    * contiguous).
    *
    * Inside the hash: per-quality aggregates pin the default-vs-
    * explicit routing AND the generated arithmetic over the full
    * corpus; the identity scalars pin count = distinct (uniqueness),
    * floor/step conformance; both rejection flags pin enforcement
    * (wrong generated value, explicit identity insert), with version
    * stability proving the failed writes committed nothing. */
  def p45DefaultColumns(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.defcols")
    s.sql("DROP TABLE IF EXISTS graft_lake.defids")
    s.sql("""CREATE TABLE graft_lake.defcols (
            |  doc_id BIGINT,
            |  source STRING,
            |  n_chars BIGINT,
            |  quality STRING DEFAULT 'unscored',
            |  gen_score BIGINT GENERATED ALWAYS AS (n_chars * 2 + 1)
            |)""".stripMargin)
    s.sql("""CREATE TABLE graft_lake.defids (
            |  row_id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1000 INCREMENT BY 3),
            |  doc_id BIGINT
            |)""".stripMargin)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .createOrReplaceTempView("p45_docs")
    // quality omitted -> DEFAULT; gen_score omitted -> computed
    s.sql("""INSERT INTO graft_lake.defcols (doc_id, source, n_chars)
            |SELECT doc_id, source, n_chars FROM p45_docs""".stripMargin)
    // explicit quality overrides the default; generated still computed
    s.sql("""INSERT INTO graft_lake.defcols (doc_id, source, n_chars, quality)
            |SELECT doc_id + 500000, source, n_chars, 'scored'
            |FROM p45_docs WHERE doc_id % 7 = 0""".stripMargin)
    // identity: values assigned by the writer, one per corpus row
    s.sql("INSERT INTO graft_lake.defids (doc_id) SELECT doc_id FROM p45_docs")
    val vBefore = graft.sources.GraftLake.latestVersion("graft_lake.defcols").toLong
    val genBlocked = expectBlocked(s) {
      s.sql("""INSERT INTO graft_lake.defcols (doc_id, source, n_chars, gen_score)
              |VALUES (1, 'x', 10, 999)""".stripMargin)
    }
    val idBlocked = expectBlocked(s) {
      s.sql("INSERT INTO graft_lake.defids (row_id, doc_id) VALUES (1, 1)")
    }
    val versionStable =
      if (graft.sources.GraftLake.latestVersion("graft_lake.defcols").toLong == vBefore) 1L
      else 0L
    val ids = s.table("graft_lake.defids")
      .agg(count(lit(1)).as("n_ids"),
        countDistinct(col("row_id")).as("n_distinct_ids"),
        max(when(col("row_id") < 1000L || (col("row_id") - 1000L) % 3L =!= 0L, 1L)
          .otherwise(0L)).as("id_nonconforming"))
    s.table("graft_lake.defcols")
      .groupBy(col("quality"))
      .agg(count(lit(1)).as("n_rows"), sum(col("gen_score")).as("sum_gen"))
      .crossJoin(broadcast(ids)) // 1-row scalar frame
      .withColumn("gen_blocked", lit(genBlocked))
      .withColumn("id_blocked", lit(idBlocked))
      .withColumn("version_stable", lit(versionStable))
      .orderBy(col("quality"))
  }

  val p45Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |dc AS (
      |  SELECT 'unscored' AS quality, n_chars FROM d
      |  UNION ALL
      |  SELECT 'scored', n_chars FROM d WHERE doc_id % 7 = 0)
      |SELECT quality, COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars * 2 + 1) AS BIGINT) AS sum_gen,
      |  (SELECT COUNT(*) FROM d) AS n_ids,
      |  (SELECT COUNT(*) FROM d) AS n_distinct_ids,
      |  CAST(0 AS BIGINT) AS id_nonconforming,
      |  CAST(1 AS BIGINT) AS gen_blocked,
      |  CAST(1 AS BIGINT) AS id_blocked,
      |  CAST(1 AS BIGINT) AS version_stable
      |FROM dc GROUP BY quality ORDER BY quality""".stripMargin

  // ---------------------------------------------------------------- p46
  /** OPTIMIZE ZORDER BY — multi-dimensional clustering executed against
    * the lake (Delta's `OPTIMIZE ... ZORDER BY (c1, c2)`), composing
    * q94's audited Morton machinery with p38's layout-rewrite path:
    * the corpus arrives as 8 ingestion slices whose files span the FULL
    * range of BOTH scan dimensions (every 2-D box opens every file —
    * the pathology single-column clustering cannot fix on two axes at
    * once), then ONE distributed range-shuffle on the interleaved
    * 32-bit Morton rank (manifest-zone normalized, codegen fold)
    * rewrites the live set into 16 z-curve tiles.
    *
    * Inside the hash: files_scanned BEFORE is restated from first
    * principles (a slice survives iff its envelope overlaps the box in
    * BOTH dimensions), `improved` pins that the tiled layout opens
    * strictly fewer files for the SAME box, `answer_*` pins zero data
    * change, `cdc_rows` pins CDC invisibility (dataChange=false). The
    * sampled range boundaries make the exact after-count environment-
    * dependent, so the hash pins the inequality and Round10OpsSpec pins
    * the 2-D-beats-1-D separation on a deterministic grid. */
  def p46ZorderOptimize(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.zopt")
    s.sql("CREATE TABLE graft_lake.zopt (doc_id BIGINT, n_chars BIGINT)")
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    (0 until 8).foreach { slice => // 8 ingest commits, one file each
      docs.filter(col("doc_id") % 8 === slice).coalesce(1)
        .writeTo("graft_lake.zopt").append()
    }
    val maxDoc = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    def boxQuery() = s.table("graft_lake.zopt")
      .filter(col("doc_id") <= lit(maxDoc / 8) &&
        col("n_chars") >= 200L && col("n_chars") <= 260L)
      .agg(count(lit(1)).as("n_match"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
    val beforeAnswer = boxQuery().collect()(0)
    val before = graft.sources.LakeStore.lastScanStats("graft_lake.zopt")
    val vBefore = graft.sources.GraftLake.latestVersion("graft_lake.zopt")
    graft.sources.GraftLake.optimize(s, "graft_lake.zopt",
      Seq("doc_id", "n_chars"), nFiles = 16)
    val out = boxQuery()
    val afterAnswer = out.collect()(0)
    val after = graft.sources.LakeStore.lastScanStats("graft_lake.zopt")
    val vAfter = graft.sources.GraftLake.latestVersion("graft_lake.zopt")
    val cdcRows = graft.sources.GraftLake
      .changes(s, "graft_lake.zopt", vBefore, vAfter, "doc_id").count()
    out
      .withColumn("files_total_before", lit(before.filesTotal.toLong))
      .withColumn("files_scanned_before", lit(before.filesScanned.toLong))
      .withColumn("files_total_after", lit(after.filesTotal.toLong))
      .withColumn("improved",
        lit(if (after.filesScanned < before.filesScanned) 1L else 0L))
      .withColumn("answer_stable",
        lit(if (beforeAnswer == afterAnswer) 1L else 0L))
      .withColumn("cdc_rows", lit(cdcRows))
  }

  val p46Sql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |b AS (SELECT MAX(doc_id) // 8 AS dmax FROM d),
      |sl AS (SELECT doc_id % 8 AS s, MIN(doc_id) AS dmn, MAX(doc_id) AS dmx,
      |       MIN(n_chars) AS cmn, MAX(n_chars) AS cmx
      |       FROM d GROUP BY 1),
      |m AS (SELECT d.* FROM d CROSS JOIN b
      |      WHERE doc_id <= dmax AND n_chars BETWEEN 200 AND 260)
      |SELECT COUNT(*) AS n_match,
      |  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
      |  CAST(8 AS BIGINT) AS files_total_before,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sl CROSS JOIN b
      |   WHERE dmn <= dmax AND cmn <= 260 AND cmx >= 200) AS files_scanned_before,
      |  CAST(16 AS BIGINT) AS files_total_after,
      |  CAST(1 AS BIGINT) AS improved,
      |  CAST(1 AS BIGINT) AS answer_stable,
      |  CAST(0 AS BIGINT) AS cdc_rows
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- p47
  /** PARTITION EVOLUTION — Iceberg's signature: re-partition a LIVE
    * table as pure metadata ([[graft.sources.GraftLake.setPartitionSpec]]),
    * no rewrite, no downtime. The classic onboarding arc: the first
    * corpus half lands UNPARTITIONED (one whole-table copy-on-write
    * cohort), the spec evolves to `PARTITIONED BY (source)`, the
    * re-crawl half lands one group per source — and both eras keep
    * working: a re-score UPDATE targeted at the new era statically
    * prunes through GROUP-ENVELOPE zones (the old cohort's doc_id
    * envelope excludes the re-crawl id range, so its files are neither
    * read nor rewritten — cross-era pruning without partition keys),
    * and a MERGE whose changeset spans BOTH eras rewrites the old
    * cohort exactly once and re-lands it grouped under the NEW spec —
    * Iceberg's progressive migration, here completed by the first
    * boundary-crossing statement.
    *
    * Inside the hash: per-era aggregates restate every mutation; the
    * v4 audit scalars pin the cross-era prune (one group rewritten,
    * old files untouched); `migrated` pins that after the spanning
    * MERGE every live file's group key has the NEW spec's arity; and
    * `n_live_groups` pins the final per-source layout. */
  def p47PartitionEvolution(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.pevo")
    s.sql("CREATE TABLE graft_lake.pevo (doc_id BIGINT, source STRING, n_chars BIGINT)")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.filter(col("doc_id") % 2 === 0).coalesce(2)
      .writeTo("graft_lake.pevo").append() // v1: pre-evolution era, 2 files
    val v1Files = graft.sources.LakeStore.get("graft_lake.pevo").get
      .current.map(_.path).toSet
    graft.sources.GraftLake.setPartitionSpec("graft_lake.pevo", Seq("source")) // v2
    docs.filter(col("doc_id") % 2 === 1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .repartition(col("source"))
      .writeTo("graft_lake.pevo").append() // v3: new era, one file per source
    // v4: targeted at the NEW era — the old cohort's doc_id envelope
    // excludes it, so cross-era static pruning must keep it untouched
    s.sql("""UPDATE graft_lake.pevo SET n_chars = n_chars + 7
            |WHERE doc_id >= 1000000 AND source = 'src5'""".stripMargin)
    val st4 = graft.sources.LakeStore.get("graft_lake.pevo").get
    val v4GroupsRewritten = graft.sources.LakeStore
      .lastReplacedGroups("graft_lake.pevo").map(_.size.toLong).getOrElse(-1L)
    val v4OldIntact = if (v1Files.subsetOf(st4.current.map(_.path).toSet)) 1L else 0L
    // v5: a MERGE whose changeset spans BOTH eras + inserts a new source
    docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 97 === 0)
      .unionByName(docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 89 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      .unionByName(docs.filter(col("doc_id") % 101 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          lit("srcnew").as("source"), col("n_chars")))
      .createOrReplaceTempView("pevo_changes")
    s.sql("""MERGE INTO graft_lake.pevo t USING pevo_changes s ON t.doc_id = s.doc_id
            |WHEN MATCHED THEN UPDATE SET n_chars = t.n_chars + 1
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val st5 = graft.sources.LakeStore.get("graft_lake.pevo").get
    val migrated = if (st5.current.forall(_.group.length == 1)) 1L else 0L
    val nLiveGroups = st5.liveGroups.size.toLong
    s.table("graft_lake.pevo")
      .withColumn("era",
        when(col("doc_id") >= 2000000L, lit("ins"))
          .when(col("doc_id") >= 1000000L, lit("new"))
          .otherwise(lit("old")))
      .groupBy(col("era"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
      .withColumn("v4_groups_rewritten", lit(v4GroupsRewritten))
      .withColumn("v4_old_intact", lit(v4OldIntact))
      .withColumn("migrated", lit(migrated))
      .withColumn("n_live_groups", lit(nLiveGroups))
      .orderBy(col("era"))
  }

  val p47Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |old AS (
      |  SELECT doc_id, n_chars
      |    + (CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS n_chars
      |  FROM d WHERE doc_id % 2 = 0),
      |nw AS (
      |  SELECT doc_id + 1000000 AS doc_id, n_chars
      |    + (CASE WHEN source = 'src5' THEN 7 ELSE 0 END)
      |    + (CASE WHEN doc_id % 89 = 0 THEN 1 ELSE 0 END) AS n_chars
      |  FROM d WHERE doc_id % 2 = 1),
      |ins AS (
      |  SELECT doc_id + 2000000 AS doc_id, n_chars
      |  FROM d WHERE doc_id % 101 = 0),
      |eras AS (
      |  SELECT 'old' AS era, n_chars FROM old
      |  UNION ALL SELECT 'new', n_chars FROM nw
      |  UNION ALL SELECT 'ins', n_chars FROM ins)
      |SELECT era, COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(1 AS BIGINT) AS v4_groups_rewritten,
      |  CAST(1 AS BIGINT) AS v4_old_intact,
      |  CAST(1 AS BIGINT) AS migrated,
      |  CAST((SELECT COUNT(DISTINCT source) FROM d) + 1 AS BIGINT) AS n_live_groups
      |FROM eras GROUP BY era ORDER BY era""".stripMargin

  // ---------------------------------------------------------------- p48
  /** Per-file BLOOM INDEXES — the skipping lever zones cannot provide:
    * a point lookup on a high-cardinality id whose values INTERLEAVE
    * across every ingest file (each file's min/max spans the table —
    * the modulo-sliced ingest here makes that exact) keeps every file
    * under zone pruning, yet is THE canonical 100 TB access pattern
    * ("fetch one document by id"). With `TBLPROPERTIES
    * ('graft.bloom.columns' = 'doc_id')` each task folds its file's
    * ids into an 8 KB bloom as the rows stream past (the same single
    * write pass that records zones; the filter rides the manifest, so
    * planning stays a driver-side metadata read), and a pushed `=`
    * probe opens exactly the one file that can hold the id.
    *
    * Inside the hash, per probe: the row answer (restated from the
    * corpus), `zone_kept` — how many files min/max pruning alone
    * would scan, restated from first principles per slice envelope
    * (the "bloom was necessary" pin) — and `files_scanned = 1` (the
    * "bloom was sufficient" pin; at 2^16 bits / ~1k keys the
    * false-positive rate is ~1e-8, and the filters are deterministic,
    * so the equality is exact, not probabilistic hand-waving). */
  def p48BloomIndex(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.bloomt")
    s.sql("""CREATE TABLE graft_lake.bloomt
            |(doc_id BIGINT, source STRING, n_chars BIGINT)
            |TBLPROPERTIES ('graft.bloom.columns' = 'doc_id')""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    (0 until 8).foreach { slice => // ids interleave: every file spans the range
      docs.filter(col("doc_id") % 8 === slice).coalesce(1)
        .writeTo("graft_lake.bloomt").append()
    }
    val maxDoc = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val st = graft.sources.LakeStore.get("graft_lake.bloomt").get
    val rows = (1 to 5).map { j =>
      val pid = (maxDoc / 7) * j
      val r = s.table("graft_lake.bloomt").filter(col("doc_id") === lit(pid))
        .agg(count(lit(1)).as("n_match"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
        .collect()(0)
      val stats = graft.sources.LakeStore.lastScanStats("graft_lake.bloomt")
      // what zones ALONE would keep: files whose id envelope covers pid
      val zoneKept = st.current.count(_.zones.get("doc_id").exists { case (mn, mx) =>
        mn.asInstanceOf[java.lang.Number].longValue() <= pid &&
          mx.asInstanceOf[java.lang.Number].longValue() >= pid
      }).toLong
      (pid, r.getLong(0), r.getLong(1), stats.filesTotal.toLong, zoneKept,
        stats.filesScanned.toLong)
    }
    import s.implicits._
    rows.toDF("probe_id", "n_match", "sum_chars", "files_total", "zone_kept",
      "files_scanned")
      .orderBy(col("probe_id"))
  }

  val p48Sql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |b AS (SELECT MAX(doc_id) AS dm FROM d),
      |probes AS (SELECT (dm // 7) * j AS pid FROM b
      |           CROSS JOIN (SELECT UNNEST([1, 2, 3, 4, 5]) AS j)),
      |sl AS (SELECT doc_id % 8 AS s, MIN(doc_id) AS mn, MAX(doc_id) AS mx
      |       FROM d GROUP BY 1)
      |SELECT p.pid AS probe_id,
      |  (SELECT COUNT(*) FROM d WHERE doc_id = p.pid) AS n_match,
      |  (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM d
      |   WHERE doc_id = p.pid) AS sum_chars,
      |  CAST(8 AS BIGINT) AS files_total,
      |  (SELECT COUNT(*) FROM sl WHERE mn <= p.pid AND mx >= p.pid) AS zone_kept,
      |  CAST(1 AS BIGINT) AS files_scanned
      |FROM probes p ORDER BY probe_id""".stripMargin

  // ---------------------------------------------------------------- p49
  /** Partition-scoped INSERT OVERWRITE — both V2 overwrite modes
    * (Delta's replaceWhere / Hive's dynamic partition overwrite), wired
    * to group-granular commits: STATIC overwrite takes a filter decided
    * entirely by the partition key (equality/IN on partition columns —
    * anything looser is REFUSED loudly, because group-granular
    * replacement of a row-level filter would delete rows the filter
    * never matched) and swaps exactly the matching groups; DYNAMIC
    * overwrite (`overwritePartitions()`) swaps exactly the groups the
    * written data itself produces. Both are the O(touched-partitions)
    * backfill primitive: at 100 TB a daily re-score of one source
    * replaces one group's files and never reads or writes the rest —
    * file identity of untouched partitions is pinned in the hash.
    *
    * Inside the hash: per-class aggregates restate both overwrites,
    * `untouched_intact` pins that every non-overwritten v1 file is
    * still live file-identically, the two group counts pin the commit
    * footprints, and `bad_refused` pins the loud rejection of a
    * non-partition filter. */
  def p49PartitionOverwrite(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.povr")
    s.sql("""CREATE TABLE graft_lake.povr
            |(doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.repartition(col("source"))
      .writeTo("graft_lake.povr").append() // v1: one file per source
    val v1Files = graft.sources.LakeStore.get("graft_lake.povr").get
      .current.map(f => f.group -> f.path).toMap
    // STATIC: re-score src3 wholesale (replaceWhere on the partition key)
    docs.filter(col("source") === "src3")
      .withColumn("n_chars", col("n_chars") + 1000L)
      .writeTo("graft_lake.povr").overwrite(col("source") === lit("src3")) // v2
    val staticGroups = graft.sources.LakeStore
      .lastReplacedGroups("graft_lake.povr").map(_.size.toLong).getOrElse(-1L)
    // DYNAMIC: a re-crawl drop covering two sources replaces exactly them
    docs.filter(col("source").isin("src5", "src7"))
      .select((col("doc_id") + 400000L).as("doc_id"), col("source"),
        (col("n_chars") + 7L).as("n_chars"))
      .writeTo("graft_lake.povr").overwritePartitions() // v3
    val dynamicGroups = graft.sources.LakeStore
      .lastReplacedGroups("graft_lake.povr").map(_.size.toLong).getOrElse(-1L)
    // a filter the partition key cannot decide must be refused loudly
    val badRefused = try {
      docs.limit(1).writeTo("graft_lake.povr").overwrite(col("n_chars") < 100L); 0L
    } catch { case _: Exception => 1L }
    // every non-overwritten v1 file is still live, file-identically
    val st = graft.sources.LakeStore.get("graft_lake.povr").get
    val nowFiles = st.current.map(f => f.group -> f.path).toMap
    val untouchedIntact = if (v1Files.forall { case (g, p) =>
      Set("src3", "src5", "src7").contains(g.head.toString) ||
        nowFiles.get(g).contains(p)
    }) 1L else 0L
    s.table("graft_lake.povr")
      .withColumn("cls",
        when(col("source") === "src3", lit("static"))
          .when(col("source").isin("src5", "src7"), lit("dynamic"))
          .otherwise(lit("kept")))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .withColumn("static_groups", lit(staticGroups))
      .withColumn("dynamic_groups", lit(dynamicGroups))
      .withColumn("bad_refused", lit(badRefused))
      .withColumn("untouched_intact", lit(untouchedIntact))
      .orderBy(col("cls"))
  }

  val p49Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |fin AS (
      |  SELECT 'kept' AS cls, source, n_chars FROM d
      |    WHERE source NOT IN ('src3', 'src5', 'src7')
      |  UNION ALL
      |  SELECT 'static', source, n_chars + 1000 FROM d WHERE source = 'src3'
      |  UNION ALL
      |  SELECT 'dynamic', source, n_chars + 7 FROM d WHERE source IN ('src5', 'src7'))
      |SELECT cls, COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  COUNT(DISTINCT source) AS n_sources,
      |  CAST(1 AS BIGINT) AS static_groups,
      |  CAST(2 AS BIGINT) AS dynamic_groups,
      |  CAST(1 AS BIGINT) AS bad_refused,
      |  CAST(1 AS BIGINT) AS untouched_intact
      |FROM fin GROUP BY cls ORDER BY cls""".stripMargin

  // ---------------------------------------------------------------- p50
  /** SQL STORED PROCEDURES — the maintenance window as pure SQL `CALL`
    * statements with result sets (Iceberg's procedure surface on Spark
    * 4's native DSv2 ProcedureCatalog; analyzer-bound, named-argument
    * invocation): compaction, rollback, and retention each run as one
    * statement, and what the user sees is each procedure's RESULT ROW —
    * which is exactly what this query publishes into the hash. The arc:
    * 8 unclustered ingest commits → `CALL system.optimize` (the p38
    * range-shuffle; result pins 8 files → 4) → the same box probe
    * improves → `CALL system.restore` back to the pre-optimize snapshot
    * (result pins the version arithmetic; aggregates prove the undo) →
    * `CALL system.vacuum` (result pins exactly the 4 now-unreferenced
    * optimize files deleted, horizon at the restore commit). Every
    * number is restated from first principles by the oracle — the CALL
    * surface must report the same truth the library calls do. */
  def p50SqlProcedures(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.proc_demo")
    s.sql("CREATE TABLE graft_lake.proc_demo (doc_id BIGINT, n_chars BIGINT)")
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    (0 until 8).foreach { slice => // v1..v8: one unclustered file each
      docs.filter(col("doc_id") % 8 === slice).coalesce(1)
        .writeTo("graft_lake.proc_demo").append()
    }
    def boxScanned(): Long = {
      s.table("graft_lake.proc_demo")
        .filter(col("n_chars") >= 200L && col("n_chars") <= 260L).count()
      graft.sources.LakeStore.lastScanStats("graft_lake.proc_demo").filesScanned.toLong
    }
    val scannedBefore = boxScanned()
    val opt = s.sql(
      """CALL graft_lake.system.optimize(
        |  tbl => 'proc_demo', cluster_cols => 'n_chars', n_files => 4)""".stripMargin)
      .collect()(0) // (files_before, files_after, version)
    val scannedAfter = boxScanned()
    val rst = s.sql("CALL graft_lake.system.restore(tbl => 'proc_demo', version => 8)")
      .collect()(0) // (restored_to, new_version)
    val vac = s.sql(
      """CALL graft_lake.system.vacuum(
        |  tbl => 'proc_demo', retain_last => 1, grace_ms => 0)""".stripMargin)
      .collect()(0) // (files_deleted, horizon): exactly the 4 optimize files
    s.table("graft_lake.proc_demo")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"))
      .withColumn("opt_files_before", lit(opt.getLong(0)))
      .withColumn("opt_files_after", lit(opt.getLong(1)))
      .withColumn("opt_version", lit(opt.getLong(2)))
      .withColumn("improved", lit(if (scannedAfter < scannedBefore) 1L else 0L))
      .withColumn("restored_to", lit(rst.getLong(0)))
      .withColumn("restore_version", lit(rst.getLong(1)))
      .withColumn("vac_deleted", lit(vac.getLong(0)))
      .withColumn("vac_horizon", lit(vac.getLong(1)))
  }

  val p50Sql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(8 AS BIGINT) AS opt_files_before,
      |  CAST(4 AS BIGINT) AS opt_files_after,
      |  CAST(9 AS BIGINT) AS opt_version,
      |  CAST(1 AS BIGINT) AS improved,
      |  CAST(8 AS BIGINT) AS restored_to,
      |  CAST(10 AS BIGINT) AS restore_version,
      |  CAST(4 AS BIGINT) AS vac_deleted,
      |  CAST(10 AS BIGINT) AS vac_horizon
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- p51
  /** COLUMN MAPPING — `ALTER TABLE RENAME COLUMN` as pure metadata
    * (Delta's column-mapping `name` mode): the column's PHYSICAL
    * (parquet) name is pinned at birth in field metadata, the rename
    * touches only the logical name, and every reader era translates
    * through the schema itself — zero files rewritten, pre-rename
    * files need no translation table, post-rename writes keep storing
    * the birth name so the table stays era-uniform. Zone maps, blooms
    * and manifest column lists are all keyed physically, so data
    * skipping keeps working across the rename; row-level statements
    * (the UPDATE here spans both file eras) read and write through the
    * same mapping. Renames that would break STORED TEXT (constraints,
    * generation expressions, bloom configs — they reference logical
    * names) are refused loudly, as is renaming a live partition
    * column.
    *
    * Inside the hash: aggregates over the RENAMED name spanning both
    * eras plus a post-rename row-level UPDATE; `phys_stable` pins that
    * every live file (pre-rename, post-rename, AND the UPDATE's
    * rewrite output) stores the birth name; `old_name_v1` pins that
    * time travel to a pre-rename version surfaces the era's own
    * logical schema. */
  def p51RenameColumn(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.renm")
    s.sql("CREATE TABLE graft_lake.renm (doc_id BIGINT, source STRING, nc BIGINT)")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.filter(col("doc_id") % 2 === 0)
      .withColumnRenamed("n_chars", "nc")
      .writeTo("graft_lake.renm").append() // v1: pre-rename era
    s.sql("ALTER TABLE graft_lake.renm RENAME COLUMN nc TO n_chars") // v2: metadata-only
    docs.filter(col("doc_id") % 2 === 1)
      .writeTo("graft_lake.renm").append() // v3: post-rename era
    s.sql("UPDATE graft_lake.renm SET n_chars = n_chars + 10 WHERE doc_id % 10 = 0") // v4: spans eras
    val st = graft.sources.LakeStore.get("graft_lake.renm").get
    val physStable = if (st.current.forall(f =>
      f.cols.contains("nc") && !f.cols.contains("n_chars"))) 1L else 0L
    val oldNameV1 =
      if (s.sql("SELECT * FROM graft_lake.renm VERSION AS OF 1")
        .schema.fieldNames.sameElements(Array("doc_id", "source", "nc"))) 1L else 0L
    s.table("graft_lake.renm")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
        sum(when(col("n_chars") >= 300L, 1L).otherwise(0L)).as("n_long"))
      .withColumn("phys_stable", lit(physStable))
      .withColumn("old_name_v1", lit(oldNameV1))
  }

  val p51Sql: String =
    """WITH d AS (SELECT doc_id,
      |  n_chars + (CASE WHEN doc_id % 10 = 0 THEN 10 ELSE 0 END) AS n_chars
      |  FROM documents)
      |SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
      |  CAST(1 AS BIGINT) AS phys_stable,
      |  CAST(1 AS BIGINT) AS old_name_v1
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- p52
  /** DROP COLUMN as pure metadata — the operation Delta gates on column
    * mapping (p51's substrate): the field leaves the logical schema,
    * zero files are rewritten, and a later re-ADD of the same name binds
    * a FRESH physical name so the old column's stale bytes are never
    * resurrected — every pre-drop row reads NULL, exactly Delta's
    * contract. Time travel to a pre-drop version still reads the old
    * values through that era's own snapshot schema.
    *
    * Inside the hash: the even docs land WITH lang (v1), lang is dropped
    * (v2) and re-added (v3), the odd docs land with lang (v4) — so
    * `n_with_lang`/`n_langs` count ONLY the odd rows (stale bytes would
    * inflate both), `v1_lang_rows` pins the pre-drop era's values via
    * time travel, `fresh_physical` pins the re-bound storage name, and
    * `old_files_intact` pins that the drop rewrote nothing (the v1 files
    * are still live and still physically carry the column). */
  def p52DropColumn(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.drp")
    s.sql("CREATE TABLE graft_lake.drp (doc_id BIGINT, source STRING, lang STRING, n_chars BIGINT)")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    docs.filter(col("doc_id") % 2 === 0)
      .writeTo("graft_lake.drp").append() // v1: pre-drop era, lang populated
    s.sql("ALTER TABLE graft_lake.drp DROP COLUMN lang") // v2: metadata-only
    s.sql("ALTER TABLE graft_lake.drp ADD COLUMN lang STRING") // v3: fresh physical name
    docs.filter(col("doc_id") % 2 === 1)
      .writeTo("graft_lake.drp").append() // v4: post-re-add era
    val st = graft.sources.LakeStore.get("graft_lake.drp").get
    val freshPhysical =
      if (graft.sources.LakeStore.physicalName(st.schema("lang")) != "lang") 1L else 0L
    val v1Files = st.filesAt(1)
    val oldFilesIntact = if (v1Files.nonEmpty &&
      v1Files.forall(f => st.current.contains(f) && f.cols.contains("lang"))) 1L else 0L
    val v1LangRows = s.sql(
      "SELECT count(lang) AS c FROM graft_lake.drp VERSION AS OF 1")
      .collect()(0).getLong(0)
    s.table("graft_lake.drp")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_chars")).as("sum_chars"),
        count(col("lang")).as("n_with_lang"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("v1_lang_rows", lit(v1LangRows))
      .withColumn("fresh_physical", lit(freshPhysical))
      .withColumn("old_files_intact", lit(oldFilesIntact))
  }

  val p52Sql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(COUNT(CASE WHEN doc_id % 2 = 1 THEN lang END) AS BIGINT) AS n_with_lang,
      |  CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 1 THEN lang END) AS BIGINT) AS n_langs,
      |  CAST((SELECT COUNT(lang) FROM documents WHERE doc_id % 2 = 0) AS BIGINT) AS v1_lang_rows,
      |  CAST(1 AS BIGINT) AS fresh_physical,
      |  CAST(1 AS BIGINT) AS old_files_intact
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- p53
  /** COMMIT-LOG CHECKPOINTS — Delta's `_last_checkpoint` move: every 10
    * commits the store writes one `<v>.checkpoint.json` capturing the
    * full replayed state, so a COLD start opens the checkpoint plus the
    * per-commit tail — O(1) + O(commits since last checkpoint)
    * filesystem opens however long the history grows, instead of one
    * open (an object-store roundtrip, in production) per commit. Full
    * version fidelity is preserved: time travel BELOW the checkpoint
    * still answers exactly, because every snapshot is captured, and the
    * log (not the checkpoint) stays the source of truth.
    *
    * Inside the hash: 12 append commits land, the cache is invalidated,
    * and the cold replay must report starting from the version-10
    * checkpoint with a 2-entry tail (`ckpt_version`/`tail_entries` come
    * from the store's replay audit); `v5_rows` time-travels below the
    * checkpoint afterwards; the aggregates restate the 12 slices. */
  def p53LogCheckpoint(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.ckpt")
    s.sql("CREATE TABLE graft_lake.ckpt (doc_id BIGINT, n_chars BIGINT)")
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    (0 until 12).foreach { i =>
      docs.filter(col("doc_id") % 12 === i).writeTo("graft_lake.ckpt").append()
    } // v1..v12 — the interval-10 checkpoint lands at v10
    graft.sources.LakeStore.invalidateCache("graft_lake.ckpt")
    val frame = s.table("graft_lake.ckpt") // analysis triggers the COLD replay
    val rs = graft.sources.LakeStore.lastReplayStats("graft_lake.ckpt")
    val v5Rows = s.sql(
      "SELECT count(*) AS c FROM graft_lake.ckpt VERSION AS OF 5")
      .collect()(0).getLong(0)
    frame.agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("ckpt_version", lit(rs.checkpoint.getOrElse(-1).toLong))
      .withColumn("tail_entries", lit(rs.entriesParsed.toLong))
      .withColumn("v5_rows", lit(v5Rows))
  }

  val p53Sql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(10 AS BIGINT) AS ckpt_version,
      |  CAST(2 AS BIGINT) AS tail_entries,
      |  CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 12 <= 4) AS BIGINT) AS v5_rows
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- p54
  /** STORAGE-PARTITIONED JOIN — the Iceberg/Delta SPJ shape and the
    * decisive shuffle elimination at 100 TB: two lake tables partitioned
    * on the same key report `KeyGroupedPartitioning` (one unsplittable
    * input partition per partition group, each carrying its key), so
    * BOTH per-source aggregations AND the join between them run on the
    * storage layout with ZERO shuffle exchanges — co-location replaces
    * data movement entirely. Gated by Spark's own
    * `spark.sql.sources.v2.bucketing.enabled` (restored after the run)
    * and refused automatically when a pre-evolution file cohort breaks
    * the co-location promise.
    *
    * Inside the hash: the per-source joined aggregates (both sides) and
    * `join_exchanges`, the shuffle-exchange count inside the SortMergeJoin
    * subtree — 0 is the whole point and anything else fails the oracle. */
  def p54StoragePartitionedJoin(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.spj_chars")
    s.sql("DROP TABLE IF EXISTS graft_lake.spj_langs")
    s.sql("""CREATE TABLE graft_lake.spj_chars (doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (source)""".stripMargin)
    s.sql("""CREATE TABLE graft_lake.spj_langs (doc_id BIGINT, source STRING, lang STRING)
            |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .writeTo("graft_lake.spj_chars").append()
    docs.select(col("doc_id"), col("source"), col("lang"))
      .writeTo("graft_lake.spj_langs").append()
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.graft.preserve-data-grouping",
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.graft.preserve-data-grouping", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false") // concrete plan to audit
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = s.table("graft_lake.spj_chars").groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      val b = s.table("graft_lake.spj_langs").groupBy("source")
        .agg(min(col("lang")).as("min_lang"), max(col("lang")).as("max_lang"))
      val j = a.join(b, "source")
      val joinExchanges = j.queryExecution.executedPlan.collect {
        case sj: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          sj.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
          }.length
      }
      require(joinExchanges.nonEmpty, "graft: p54 expected a sort-merge join")
      val rows = j.collect() // materialize under the audited plan
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), j.schema)
        .withColumn("join_exchanges", lit(joinExchanges.max.toLong))
        .orderBy(col("source"))
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  val p54Sql: String =
    """SELECT source,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(lang) AS min_lang,
      |  MAX(lang) AS max_lang,
      |  CAST(0 AS BIGINT) AS join_exchanges
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p55
  /** ATOMIC `CREATE OR REPLACE TABLE ... AS SELECT` through the DSv2
    * staging protocol (Delta's CREATE OR REPLACE contract): the query's
    * tasks write real files FIRST — invisible, because no manifest
    * references them — and the swap lands as ONE history-PRESERVING
    * "replace" commit carrying schema, partition spec, properties and
    * data together. Readers never see an intermediate state, a failed
    * query aborts by sweeping only its own files, and time travel to
    * pre-replace versions keeps working (the log survives; only the
    * live state changes). The replace here reads FROM THE TABLE ITSELF
    * — legal precisely because staging writes before swapping.
    *
    * Inside the hash: post-replace aggregates over the reshaped
    * (partitioned, filtered) table, pre-replace aggregates via time
    * travel, `replace_commits` = 1 (the swap is one commit — the
    * non-atomic drop+create path would reset history instead). */
  def p55ReplaceTable(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.rpl")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .createOrReplaceTempView("p55_docs")
    s.sql("CREATE TABLE graft_lake.rpl AS SELECT doc_id, n_chars FROM p55_docs") // v0+v1 (CTAS)
    s.sql("""CREATE OR REPLACE TABLE graft_lake.rpl PARTITIONED BY (source)
            |AS SELECT r.doc_id, d.source, d.lang, r.n_chars + 5 AS n_chars
            |FROM graft_lake.rpl r JOIN p55_docs d ON r.doc_id = d.doc_id
            |WHERE r.doc_id % 3 = 0""".stripMargin) // v2: ONE replace commit
    val st = graft.sources.LakeStore.get("graft_lake.rpl").get
    val replaceCommits =
      st.snapshots.zipWithIndex.count { case (sn, _) => sn.action == "replace" }
    val specOk = if (st.partitionCols == Seq("source")) 1L else 0L
    val v1 = s.sql(
      "SELECT count(*) AS c, sum(n_chars) AS sc FROM graft_lake.rpl VERSION AS OF 1")
      .collect()(0)
    s.table("graft_lake.rpl")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .withColumn("v1_rows", lit(v1.getLong(0)))
      .withColumn("v1_chars", lit(v1.getLong(1)))
      .withColumn("replace_commits", lit(replaceCommits.toLong))
      .withColumn("spec_ok", lit(specOk))
  }

  val p55Sql: String =
    """SELECT
      |  CAST(COUNT(CASE WHEN doc_id % 3 = 0 THEN 1 END) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN n_chars + 5 END) AS BIGINT) AS sum_chars,
      |  CAST(COUNT(DISTINCT CASE WHEN doc_id % 3 = 0 THEN source END) AS BIGINT) AS n_sources,
      |  COUNT(*) AS v1_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS v1_chars,
      |  CAST(1 AS BIGINT) AS replace_commits,
      |  CAST(1 AS BIGINT) AS spec_ok
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- p56
  /** TYPE WIDENING — `ALTER TABLE ... ALTER COLUMN x TYPE <wider>` as
    * pure metadata (Delta's type-widening feature): lossless promotions
    * only (byte→short→int→long, float→double — Spark's analyzer already
    * refuses non-upcasts; the catalog is stricter still and refuses
    * exactness-losing ones like int→double), zero files rewritten — the
    * pre-widening files keep their narrow physical type and the reader
    * up-casts. Both skipping levers stay exact across the boundary:
    * zones compare numerically across boxed widths, and blooms
    * canonicalize every integral to long bytes.
    *
    * Inside the hash: aggregates spanning both width eras with values
    * only the WIDE type can hold, the narrow era restated via time
    * travel, and a zone-skip flag — a probe above INT range must skip
    * the narrow-era files off their replayed zones. */
  def p56TypeWidening(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.wid")
    s.sql("CREATE TABLE graft_lake.wid (doc_id BIGINT, n INT)")
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("n_chars").cast("int").as("n"))
      .writeTo("graft_lake.wid").append() // v1: narrow era (INT32 files)
    s.sql("ALTER TABLE graft_lake.wid ALTER COLUMN n TYPE BIGINT") // v2: metadata-only
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), (col("n_chars") + 3000000000L).as("n"))
      .writeTo("graft_lake.wid").append() // v3: values beyond INT range
    val v1Sum = s.sql("SELECT sum(n) AS sn FROM graft_lake.wid VERSION AS OF 1")
      .collect()(0).getLong(0)
    // a probe above INT range must skip every narrow-era file by zones
    val probed = s.table("graft_lake.wid").filter(col("n") > 3000000000L).count()
    val stats = graft.sources.LakeStore.lastScanStats("graft_lake.wid")
    val skipFlag = if (probed > 0 && stats.filesScanned < stats.filesTotal) 1L else 0L
    s.table("graft_lake.wid")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n")).as("sum_n"),
        sum(when(col("n") > 2147483647L, 1L).otherwise(0L)).as("n_wide"))
      .withColumn("v1_sum", lit(v1Sum))
      .withColumn("files_skipped", lit(skipFlag))
  }

  val p56Sql: String =
    """WITH w AS (
      |  SELECT doc_id, CAST(CAST(n_chars AS INT) AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, n_chars + 3000000000 FROM documents WHERE doc_id % 2 = 1)
      |SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(n) AS BIGINT) AS sum_n,
      |  CAST(COUNT(CASE WHEN n > 2147483647 THEN 1 END) AS BIGINT) AS n_wide,
      |  CAST((SELECT SUM(CAST(n_chars AS INT)) FROM documents
      |        WHERE doc_id % 2 = 0) AS BIGINT) AS v1_sum,
      |  CAST(1 AS BIGINT) AS files_skipped
      |FROM w""".stripMargin

  // ---------------------------------------------------------------- p57
  /** HIDDEN PARTITIONING — Iceberg's signature layout move: the table
    * is partitioned by DERIVED keys (`days(ts)`, `bucket(8, user_id)`)
    * the user never writes; queries filter on the SOURCE columns and
    * pruning still works, because per-file zones and group-envelope
    * zones bound the source values — nothing ever inverts the
    * transform. Row-level statements runtime-prune the same way: the
    * one-day UPDATE below must replace only that day's groups. At
    * 100 TB this is THE standard time-series layout: a day of data is
    * a group-addressable unit, and a user-id bucket bounds each
    * rewrite's fan-in, with zero user-visible layout columns.
    *
    * Inside the hash: aggregates after a one-day UPDATE (+1 per row on
    * the earliest day), the manifest's day-key count restated as
    * DuckDB's own epoch-day count, the one-day probe's row count, a
    * file-skip flag (the probe must not open other days' files), and a
    * one-day-touched flag (the UPDATE's replaced groups all share one
    * day key). */
  def p57HiddenPartitioning(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.hp")
    s.sql("""CREATE TABLE graft_lake.hp
            |(event_id BIGINT, user_id BIGINT, ts TIMESTAMP, cents BIGINT)
            |PARTITIONED BY (days(ts), bucket(8, user_id))""".stripMargin)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
      // co-locate each day per task so a task writes <= 8 bucket files
      .repartition(col("ts").cast("date"))
      .writeTo("graft_lake.hp").append()
    val st0 = graft.sources.LakeStore.get("graft_lake.hp").get
    val dayKeys = st0.current.map(_.group.head.asInstanceOf[Integer].intValue()).distinct
    val minDay = dayKeys.min
    val lo = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(minDay * 86400L))
    val hi = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond((minDay + 1) * 86400L))
    val probed = s.table("graft_lake.hp")
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi)).count()
    val stats = graft.sources.LakeStore.lastScanStats("graft_lake.hp")
    val skipFlag = if (stats.filesScanned < stats.filesTotal) 1L else 0L
    s.sql(s"""UPDATE graft_lake.hp SET cents = cents + 1
             |WHERE ts >= TIMESTAMP'$lo' AND ts < TIMESTAMP'$hi'""".stripMargin)
    val touched: Option[Set[List[Any]]] =
      graft.sources.LakeStore.lastReplacedGroups.get("graft_lake.hp").flatten
    val oneDay = if (touched.exists(gs =>
      gs.nonEmpty && gs.map(_.head).size == 1)) 1L else 0L
    s.table("graft_lake.hp")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cents")).as("sum_cents"),
        sum(col("user_id")).as("sum_uids"))
      .withColumn("n_days", lit(dayKeys.length.toLong))
      .withColumn("probed_rows", lit(probed))
      .withColumn("files_skipped", lit(skipFlag))
      .withColumn("one_day_touched", lit(oneDay))
  }

  val p57Sql: String =
    """WITH e AS (SELECT event_id, user_id,
      |    CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events)
      |SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(cents + (CASE WHEN day = (SELECT MIN(day) FROM e)
      |    THEN 1 ELSE 0 END)) AS BIGINT) AS sum_cents,
      |  CAST(SUM(user_id) AS BIGINT) AS sum_uids,
      |  CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
      |  CAST((SELECT COUNT(*) FROM e WHERE day = (SELECT MIN(day) FROM e))
      |    AS BIGINT) AS probed_rows,
      |  CAST(1 AS BIGINT) AS files_skipped,
      |  CAST(1 AS BIGINT) AS one_day_touched
      |FROM e""".stripMargin

  // ---------------------------------------------------------------- p58
  /** OPTIMISTIC CONCURRENCY with logical conflict RESOLUTION — the Delta
    * ConflictChecker taxonomy at partition-group granularity: every
    * write plans against a READ VERSION and, when the table advanced
    * before its commit, classifies the intervening commits instead of
    * blindly failing (the pre-p58 behavior) or blindly winning (lost
    * updates). Blind appends REBASE over anything; row-level statements
    * over DISJOINT partition groups rebase too (two UPDATEs on
    * different partitions both land); OVERLAPPING groups and concurrent
    * METADATA changes abort loudly with a retryable conflict error. At
    * 100 TB this is the difference between "one writer per table" and
    * a fleet of per-partition ingest jobs committing freely.
    *
    * Interleaving is DETERMINISTIC: [[LakeStore.onNextCommit]] runs the
    * second writer between the first writer's plan and its commit,
    * inside the store lock — no thread timing in the hash.
    *
    * Inside the hash: per-partition aggregates after (a) disjoint
    * UPDATE||UPDATE — both land, (b) overlapping UPDATE||UPDATE — the
    * interleaved writer wins, the optimistic one aborts, (c) blind
    * append||UPDATE — both land, (d) append||ALTER TBLPROPERTIES —
    * metadata conflict, append aborts; plus one outcome flag per case. */
  def p58OptimisticConcurrency(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.occ"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, score BIGINT)
             |PARTITIONED BY (source)""".stripMargin)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("score"))
      .writeTo(key).append()
    def conflictOf(thunk: => Unit): Long = try { thunk; 0L } catch {
      case e: Throwable =>
        def causes(t: Throwable): Seq[Throwable] =
          if (t == null) Nil else t +: causes(t.getCause)
        if (causes(e).exists(c => c.getMessage != null &&
          c.getMessage.contains("commit conflict"))) 1L else throw e
    }
    // (a) DISJOINT row-level ops: src2's UPDATE lands between src1's
    // plan and commit — disjoint groups, so src1's commit REBASES
    val aConflict = conflictOf {
      graft.sources.LakeStore.onNextCommit.put(key, () =>
        s.sql(s"UPDATE $key SET score = score + 1000 WHERE source = 'src2'"))
      s.sql(s"UPDATE $key SET score = score + 100 WHERE source = 'src1'")
    }
    // (b) OVERLAPPING: both writers touch src4 — the interleaved writer
    // commits first and WINS; the optimistic one aborts (committing
    // would silently discard the +7)
    val bConflict = conflictOf {
      graft.sources.LakeStore.onNextCommit.put(key, () =>
        s.sql(s"UPDATE $key SET score = score + 7 WHERE source = 'src4'"))
      s.sql(s"UPDATE $key SET score = score + 5 WHERE source = 'src4'")
    }
    // (c) BLIND APPEND vs row-level: an append reads nothing — it
    // rebases over the interleaved src5 UPDATE, both land
    val cConflict = conflictOf {
      graft.sources.LakeStore.onNextCommit.put(key, () =>
        s.sql(s"UPDATE $key SET score = score + 3 WHERE source = 'src5'"))
      s.range(50).select((col("id") + 900000L).as("doc_id"),
        lit("srcA").as("source"), lit(11L).as("score")).writeTo(key).append()
    }
    // (d) METADATA change: a CHECK constraint lands between the append's
    // plan and commit — the append was NOT validated against it, abort
    val dConflict = conflictOf {
      graft.sources.LakeStore.onNextCommit.put(key, () =>
        s.sql(s"""ALTER TABLE $key SET TBLPROPERTIES (
                 |'graft.constraints.occ_pos' = 'score >= -1000000')""".stripMargin))
      s.range(10).select((col("id") + 950000L).as("doc_id"),
        lit("srcB").as("source"), lit(13L).as("score")).writeTo(key).append()
    }
    s.table(key)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("score")).as("sum_score"))
      .withColumn("a_rebased", lit(1L - aConflict))
      .withColumn("b_conflict", lit(bConflict))
      .withColumn("c_rebased", lit(1L - cConflict))
      .withColumn("d_conflict", lit(dConflict))
      .orderBy(col("source"))
  }

  val p58Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars AS score FROM documents),
      |fin AS (
      |  SELECT source, score + CASE source
      |      WHEN 'src1' THEN 100 WHEN 'src2' THEN 1000
      |      WHEN 'src4' THEN 7 WHEN 'src5' THEN 3 ELSE 0 END AS score
      |  FROM d
      |  UNION ALL
      |  SELECT 'srcA', 11 FROM range(50))
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(SUM(score) AS BIGINT) AS sum_score,
      |  CAST(1 AS BIGINT) AS a_rebased,
      |  CAST(1 AS BIGINT) AS b_conflict,
      |  CAST(1 AS BIGINT) AS c_rebased,
      |  CAST(1 AS BIGINT) AS d_conflict
      |FROM fin GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p59
  /** BRANCHES, TAGS and WRITE-AUDIT-PUBLISH — Iceberg refs over the
    * commit log: a BRANCH is a named writable lineage (its creation is
    * one metadata-only log entry copying the base snapshot; branch
    * commits occupy ordinary log versions with `parent` pointing along
    * the branch, so replay, time travel and VACUUM's keep-set all see
    * them for free), a TAG is an immutable pointer readable forever via
    * `VERSION AS OF '<name>'`, and PUBLISH fast-forwards main to the
    * branch head as ONE data commit — refused when main advanced past
    * the fork base. While the `graft.lake.branch` session conf names a
    * branch (Iceberg's spark.wap.branch), every read AND write is
    * branch-scoped: bad batches are caught by the table's CHECK
    * constraints on the branch, main never sees unaudited rows, and the
    * CHANGE FEED delivers the whole audited batch at publish time. At
    * 100 TB this is how ingest validates terabytes without a staging
    * copy: zero files move at branch, tag, or publish.
    *
    * Inside the hash: per-source aggregates over main after the full
    * arc (branch → bad batch refused by CHECK → good append + UPDATE on
    * the branch → publish → tag → main moves on), main's pre-publish
    * invisibility flag, branch/tag row counts via named-ref time
    * travel, the refs metadata table folded to a literal, and the
    * publish commit's change-feed I/D row counts. */
  def p59BranchWap(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.wap"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, score BIGINT)
             |PARTITIONED BY (source)
             |TBLPROPERTIES ('graft.constraints.nonneg' = 'score >= 0')""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("score"))
    docs.writeTo(key).append() // v1
    s.sql("CALL graft_lake.system.create_branch(tbl => 'wap', name => 'audit')") // v2
    def onBranch[T](body: => T): T = {
      s.conf.set("graft.lake.branch", "audit")
      try body finally s.conf.unset("graft.lake.branch")
    }
    // WRITE-AUDIT: the bad batch violates the CHECK constraint ON THE
    // BRANCH — nothing lands anywhere, main never saw it
    val gateCaught = onBranch {
      try {
        s.range(5).select((col("id") + 800000L).as("doc_id"),
          lit("srcBad").as("source"), lit(-5L).as("score")).writeTo(key).append()
        0L
      } catch { case e: Throwable =>
        def causes(t: Throwable): Seq[Throwable] =
          if (t == null) Nil else t +: causes(t.getCause)
        if (causes(e).exists(c => c.getMessage != null &&
          c.getMessage.contains("CHECK constraint"))) 1L else throw e
      }
    }
    onBranch { // the audited good batch: an append and a row-level UPDATE
      s.range(50).select((col("id") + 900000L).as("doc_id"),
        lit("srcW").as("source"), lit(21L).as("score")).writeTo(key).append()
      s.sql(s"UPDATE $key SET score = score + 100 WHERE source = 'src1'")
    }
    val docCount = docs.count()
    val mainInvisible = if (s.table(key).count() == docCount) 1L else 0L
    val branchRows = s.sql(s"SELECT count(*) AS c FROM $key VERSION AS OF 'audit'")
      .collect()(0).getLong(0)
    val pub = s.sql("CALL graft_lake.system.publish(tbl => 'wap', branch => 'audit')")
      .collect()(0) // (branch_head, publish_version)
    s.sql("CALL graft_lake.system.create_tag(tbl => 'wap', name => 'rel1')")
    s.range(10).select((col("id") + 950000L).as("doc_id"),
      lit("srcZ").as("source"), lit(9L).as("score")).writeTo(key).append()
    val tag = s.sql(s"""SELECT count(*) AS c, sum(score) AS sc
                       |FROM $key VERSION AS OF 'rel1'""".stripMargin).collect()(0)
    // the publish commit IS the branch delta in the change feed
    val pv = pub.getLong(1).toString
    val feed = s.read.option("startingVersion", pv).option("endingVersion", pv)
      .table(s"$key.changes").groupBy(col("_change")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val refs = s.sql(s"SELECT name, kind FROM $key.refs ORDER BY name")
      .collect().map(r => s"${r.getString(0)}:${r.getString(1)}").mkString(",")
    s.table(key)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("score")).as("sum_score"))
      .withColumn("gate_caught", lit(gateCaught))
      .withColumn("main_invisible_prepublish", lit(mainInvisible))
      .withColumn("branch_rows", lit(branchRows))
      .withColumn("tag_rows", lit(tag.getLong(0)))
      .withColumn("tag_sum", lit(tag.getLong(1)))
      .withColumn("feed_inserts", lit(feed.getOrElse("I", 0L)))
      .withColumn("feed_deletes", lit(feed.getOrElse("D", 0L)))
      .withColumn("refs", lit(refs))
      .orderBy(col("source"))
  }

  val p59Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars AS score FROM documents),
      |fin AS (
      |  SELECT source,
      |    score + CASE source WHEN 'src1' THEN 100 ELSE 0 END AS score
      |  FROM d
      |  UNION ALL SELECT 'srcW', 21 FROM range(50)
      |  UNION ALL SELECT 'srcZ', 9 FROM range(10))
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(SUM(score) AS BIGINT) AS sum_score,
      |  CAST(1 AS BIGINT) AS gate_caught,
      |  CAST(1 AS BIGINT) AS main_invisible_prepublish,
      |  CAST((SELECT COUNT(*) + 50 FROM d) AS BIGINT) AS branch_rows,
      |  CAST((SELECT COUNT(*) + 50 FROM d) AS BIGINT) AS tag_rows,
      |  CAST((SELECT SUM(score) + 50 * 21
      |        FROM (SELECT score + CASE source WHEN 'src1' THEN 100 ELSE 0 END AS score
      |              FROM d)) AS BIGINT) AS tag_sum,
      |  CAST((SELECT COUNT(*) FROM d WHERE source = 'src1') + 50 AS BIGINT)
      |    AS feed_inserts,
      |  CAST((SELECT COUNT(*) FROM d WHERE source = 'src1') AS BIGINT)
      |    AS feed_deletes,
      |  'audit:branch,main:branch,rel1:tag' AS refs
      |FROM fin GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p60
  /** MERGE WITH SCHEMA EVOLUTION — the ONE-STATEMENT form of Delta's
    * auto schema evolution: the table declares Spark 4's
    * `AUTOMATIC_SCHEMA_EVOLUTION` capability, so the analyzer's
    * ResolveMergeIntoSchemaEvolution computes the source-only columns as
    * `TableChange.AddColumn` and drives this catalog's alterTable BEFORE
    * planning the merge — the same metadata-only ADD COLUMN commit as
    * p37 (zero files rewritten; pre-evolution files read the new column
    * as null), now applied automatically inside the MERGE instead of as
    * a separate ALTER. Column mapping composes: if the incoming column
    * name collides with a renamed column's physical birth name, the
    * re-ADD binds a fresh physical name and stale bytes never resurrect
    * (pinned in Round12OpsSpec).
    *
    * Inside the hash: per-source aggregates after a MERGE whose source
    * carries a brand-new `label` column (updates + inserts), the null
    * count on `label` for untouched rows, and the pre-merge schema width
    * via time travel. */
  def p60MergeSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.mse"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, score BIGINT)
             |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("score"))
    docs.writeTo(key).append() // v1
    docs.filter(col("source") === "src2")
      .withColumn("score", col("score") + 55L)
      .withColumn("label", lit("upd"))
      .unionByName(
        s.range(40).select((col("id") + 900000L).as("doc_id"),
          lit("srcN").as("source"), lit(17L).as("score"),
          lit("new").as("label")))
      .createOrReplaceTempView("p60_src")
    s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $key t
             |USING p60_src s ON t.doc_id = s.doc_id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val v1Cols = s.sql(s"SELECT * FROM $key VERSION AS OF 1 LIMIT 0")
      .columns.length.toLong
    s.table(key)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("score")).as("sum_score"),
        count(col("label")).as("n_labeled"))
      .withColumn("pre_merge_cols", lit(v1Cols))
      .orderBy(col("source"))
  }

  val p60Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars AS score FROM documents),
      |fin AS (
      |  SELECT source,
      |    score + CASE source WHEN 'src2' THEN 55 ELSE 0 END AS score,
      |    CASE source WHEN 'src2' THEN 'upd' END AS label
      |  FROM d
      |  UNION ALL SELECT 'srcN', 17, 'new' FROM range(40))
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(SUM(score) AS BIGINT) AS sum_score,
      |  CAST(COUNT(label) AS BIGINT) AS n_labeled,
      |  CAST(3 AS BIGINT) AS pre_merge_cols
      |FROM fin GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p61
  /** ROW LINEAGE — Delta row tracking's observable contract: every row
    * carries a STABLE engine-assigned `row_id`, invariant across
    * copy-on-write UPDATE and layout-only OPTIMIZE/ZORDER (the two ways
    * a row physically moves without logically changing). The id is the
    * existing IDENTITY machinery doing lineage duty: writer-assigned
    * from coordination-free per-task blocks at insert, CARRIED
    * verbatim through row-level rewrites and (fixed this round) through
    * layout rewrites — so `changes()` keyed by `row_id` classifies a
    * rewrite-heavy history exactly, immune to any reordering of
    * payload-identical rows. All invariance checks below run as
    * DISTRIBUTED time-travel self-joins (no driver-side row maps).
    *
    * Inside the hash: per-source aggregates after an UPDATE, an
    * id-uniqueness count, two invariance flags (update, optimize) from
    * version-pinned joins, and the row_id-keyed change-feed U count. */
  def p61RowLineage(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.rowlin"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (
             |  row_id BIGINT GENERATED ALWAYS AS IDENTITY,
             |  doc_id BIGINT, source STRING, score BIGINT)
             |PARTITIONED BY (source)""".stripMargin)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("score"))
      .writeTo(key).append() // v1: ids assigned
    def lineageAt(v: Int) =
      s.sql(s"SELECT row_id, doc_id FROM $key VERSION AS OF $v")
    s.sql(s"UPDATE $key SET score = score + 9 WHERE source = 'src3'") // v2
    val stableUpdate = lineageAt(2).as("b").join(lineageAt(1).as("a"), "doc_id")
      .filter(col("a.row_id") =!= col("b.row_id")).count()
    graft.sources.GraftLake.optimize(s, key, Seq("doc_id", "score"), 4) // v3
    val stableOptimize = lineageAt(3).as("b").join(lineageAt(2).as("a"), "doc_id")
      .filter(col("a.row_id") =!= col("b.row_id")).count()
    val ids = s.table(key).agg(
      count(lit(1)).as("n"), countDistinct(col("row_id")).as("d")).collect()(0)
    // stable ids make the change feed EXACT: keyed by row_id, the
    // UPDATE's commit nets to exactly the touched rows as U
    val cdfU = graft.sources.GraftLake.changes(s, key, 1, 2, "row_id")
      .filter(col("change") === "U").count()
    s.table(key)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("score")).as("sum_score"))
      .withColumn("ids_unique", lit(if (ids.getLong(0) == ids.getLong(1)) 1L else 0L))
      .withColumn("stable_under_update", lit(if (stableUpdate == 0L) 1L else 0L))
      .withColumn("stable_under_optimize", lit(if (stableOptimize == 0L) 1L else 0L))
      .withColumn("cdf_updates", lit(cdfU))
      .orderBy(col("source"))
  }

  val p61Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars AS score FROM documents)
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(SUM(score + CASE source WHEN 'src3' THEN 9 ELSE 0 END) AS BIGINT)
      |    AS sum_score,
      |  CAST(1 AS BIGINT) AS ids_unique,
      |  CAST(1 AS BIGINT) AS stable_under_update,
      |  CAST(1 AS BIGINT) AS stable_under_optimize,
      |  CAST((SELECT COUNT(*) FROM d WHERE source = 'src3') AS BIGINT)
      |    AS cdf_updates
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p62
  /** EQUALITY DELETES — Iceberg v2's keyed-upsert write path, the
    * merge-on-read flavor position vectors cannot give: an upsert
    * APPENDS its new row versions and records, in the SAME commit, an
    * equality delete on the key columns referencing those rows' own
    * files — older rows with matching keys die at READ time through a
    * per-file sequence gate (delete applies to files with seq < its
    * own). Write cost = append cost: nothing is read, nothing is
    * rewritten — the primitive that makes high-rate keyed streaming
    * ingestion affordable at 100 TB, where a MERGE pays a read of every
    * matched partition before it can write. Readers pay a bounded
    * key-set probe (the upserted keys since the last compaction);
    * any OPTIMIZE/rewrite migrates the table off the delete debt and
    * the entry is PRUNED from the snapshot.
    *
    * Inside the hash: per-source aggregates after two stacked upserts
    * (re-score + new docs, then a partial re-version of the first
    * batch — the sequence gate layering), a zero-rewrite flag (every
    * pre-upsert file still live by path), the change feed's exact I/D
    * counts for both upsert commits, and the post-OPTIMIZE prune flag
    * with identical aggregates. */
  def p62EqualityDeletes(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.equp"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, score BIGINT)
             |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("score"))
    docs.writeTo(key).append() // v1
    val pathsV1 = graft.sources.LakeStore.get(key).get.current.map(_.path).toSet
    // upsert 1 (v2): re-score src2 + 30 brand-new srcU docs
    graft.sources.GraftLake.upsert(
      docs.filter(col("source") === "src2")
        .withColumn("score", col("score") + 500L)
        .unionByName(s.range(30).select((col("id") + 900000L).as("doc_id"),
          lit("srcU").as("source"), lit(19L).as("score"))),
      key, Seq("doc_id"))
    // upsert 2 (v3): re-version HALF of the srcU batch — the new rows
    // post-date upsert 1's delete, and upsert 2's delete kills exactly
    // their v2 versions (sequence layering)
    graft.sources.GraftLake.upsert(
      s.range(30).filter(col("id") % 2 === 0)
        .select((col("id") + 900000L).as("doc_id"),
          lit("srcU").as("source"), lit(23L).as("score")),
      key, Seq("doc_id"))
    val st3 = graft.sources.LakeStore.get(key).get
    val noRewrite = if (pathsV1.subsetOf(st3.current.map(_.path).toSet)) 1L else 0L
    def feed(v: Int): Map[String, Long] =
      s.read.option("startingVersion", v.toString).option("endingVersion", v.toString)
        .table(s"$key.changes").groupBy(col("_change")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (f2, f3) = (feed(2), feed(3))
    // compaction materializes the deletes: entries pruned, content same
    graft.sources.GraftLake.optimize(s, key, "doc_id", 4)
    val pruned =
      if (graft.sources.LakeStore.get(key).get.eqDeletes.isEmpty) 1L else 0L
    s.table(key)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("score")).as("sum_score"))
      .withColumn("no_rewrite", lit(noRewrite))
      .withColumn("feed_i_v2", lit(f2.getOrElse("I", 0L)))
      .withColumn("feed_d_v2", lit(f2.getOrElse("D", 0L)))
      .withColumn("feed_i_v3", lit(f3.getOrElse("I", 0L)))
      .withColumn("feed_d_v3", lit(f3.getOrElse("D", 0L)))
      .withColumn("eq_pruned", lit(pruned))
      .orderBy(col("source"))
  }

  val p62Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars AS score FROM documents),
      |fin AS (
      |  SELECT source,
      |    score + CASE source WHEN 'src2' THEN 500 ELSE 0 END AS score
      |  FROM d
      |  UNION ALL SELECT 'srcU', CASE WHEN i % 2 = 0 THEN 23 ELSE 19 END
      |    FROM range(30) t(i))
      |SELECT source, COUNT(*) AS n_rows,
      |  CAST(SUM(score) AS BIGINT) AS sum_score,
      |  CAST(1 AS BIGINT) AS no_rewrite,
      |  CAST((SELECT COUNT(*) FROM d WHERE source = 'src2') + 30 AS BIGINT)
      |    AS feed_i_v2,
      |  CAST((SELECT COUNT(*) FROM d WHERE source = 'src2') AS BIGINT)
      |    AS feed_d_v2,
      |  CAST(15 AS BIGINT) AS feed_i_v3,
      |  CAST(15 AS BIGINT) AS feed_d_v3,
      |  CAST(1 AS BIGINT) AS eq_pruned
      |FROM fin GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p63
  /** STORAGE-PARTITIONED JOIN OVER A BUCKET TRANSFORM — Iceberg's
    * signature shuffle elimination, one step past p54's identity SPJ:
    * both tables are hidden-partitioned `bucket(8, doc_id)`, and the
    * catalog's FUNCTION CATALOG ([[graft.sources.LakeFunctions]])
    * resolves the transform so Catalyst can PROVE co-location — the
    * scan reports `KeyGroupedPartitioning(bucket(8, doc_id))`, Spark
    * binds `graft_lake.bucket` on both sides, checks canonical-name and
    * partition-value agreement, and plans the doc_id join with ZERO
    * exchanges. Bucketing is THE co-location layout for
    * high-cardinality keys at 100 TB (identity would make one group per
    * doc); the same partitioning also satisfies groupBy(doc_id)'s
    * distribution — bucket(doc_id) clusters doc_id — so the per-doc
    * aggregate runs exchange-free too.
    *
    * Inside the hash: per-source joined aggregates, `join_exchanges`
    * (shuffles inside the SortMergeJoin subtree — 0 is the point),
    * `agg_exchanges` (shuffles in a groupBy over the bucket SOURCE
    * column — also 0), and `fn_matches_layout` — the SQL-callable
    * `graft_lake.bucket(8, doc_id)` reproduces every live file's
    * manifest group key, i.e. the reader's co-location proof and the
    * writer's routing are the same function, row for row. */
  def p63BucketSpj(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.bspj_chars")
    s.sql("DROP TABLE IF EXISTS graft_lake.bspj_langs")
    s.sql("""CREATE TABLE graft_lake.bspj_chars (doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (bucket(8, doc_id))""".stripMargin)
    s.sql("""CREATE TABLE graft_lake.bspj_langs (doc_id BIGINT, lang STRING)
            |PARTITIONED BY (bucket(8, doc_id))""".stripMargin)
    val docs = Tables.documents(s, dir)
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .writeTo("graft_lake.bspj_chars").append()
    docs.select(col("doc_id"), col("lang"))
      .writeTo("graft_lake.bspj_langs").append()
    // reader-side function vs writer-side routing: every (file, fn-bucket)
    // pair observed in the data must be that file's manifest group key
    val got = s.sql(
      """SELECT _file, graft_lake.bucket(8, doc_id) AS b
        |FROM graft_lake.bspj_chars""".stripMargin)
      .distinct().collect().map(r => r.getString(0) -> r.getInt(1))
    val want = {
      val st = graft.sources.LakeStore.get("graft_lake.bspj_chars").get
      st.current.map(f =>
        graft.sources.LakeStore.resolvePath("graft_lake.bspj_chars", f)
          -> f.group.head).toMap
    }
    val fnMatches = got.length == want.size &&
      got.forall { case (p, b) => want.get(p).exists(_ == b) }
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.graft.preserve-data-grouping",
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.graft.preserve-data-grouping", "true")
      s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val perDoc = s.table("graft_lake.bspj_chars")
        .groupBy("doc_id").agg(sum(col("n_chars")).as("chars"))
      val aggExchanges = perDoc.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.length
      val j = s.table("graft_lake.bspj_chars")
        .join(s.table("graft_lake.bspj_langs"), "doc_id")
      val joinExchanges = j.queryExecution.executedPlan.collect {
        case sj: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          sj.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
          }.length
      }
      require(joinExchanges.nonEmpty, "graft: p63 expected a sort-merge join")
      val res = j.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("lang")).as("min_lang"), max(col("lang")).as("max_lang"))
        .withColumn("join_exchanges", lit(joinExchanges.max.toLong))
        .withColumn("agg_exchanges", lit(aggExchanges.toLong))
        .withColumn("fn_matches_layout", lit(if (fnMatches) 1L else 0L))
        .orderBy(col("source"))
      val rows = res.collect() // materialize under the audited confs
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), res.schema)
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  val p63Sql: String =
    """SELECT source,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(lang) AS min_lang,
      |  MAX(lang) AS max_lang,
      |  CAST(0 AS BIGINT) AS join_exchanges,
      |  CAST(0 AS BIGINT) AS agg_exchanges,
      |  CAST(1 AS BIGINT) AS fn_matches_layout
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p64
  /** STORAGE-PARTITIONED JOIN OVER A TEMPORAL TRANSFORM — the
    * time-series sibling of p63: two event column families are
    * hidden-partitioned `days(ts)`, and joining them back on
    * (event_id, ts) is exchange-free because `days(ts)`'s references
    * are a subset of the join keys — Catalyst aligns the two scans'
    * day groups directly. This is the canonical 100 TB log-enrichment
    * shape: telemetry and its enrichment land day-partitioned by
    * arrival, and the join never shuffles either side. Day-level
    * PARTITION PRUNING composes: the ts range filter prunes whole day
    * groups on both sides BEFORE planning, and the pruned scans still
    * align key-grouped.
    *
    * Inside the hash: per-type joined aggregates over a 10-day window
    * (cents-exact value sums), `join_exchanges` = 0, and
    * `groups_pruned_gt0` — the window filter skipped whole day groups
    * (scan-stats audit), proving pruning and SPJ compose. */
  def p64TemporalSpj(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.tspj_types")
    s.sql("DROP TABLE IF EXISTS graft_lake.tspj_values")
    s.sql("""CREATE TABLE graft_lake.tspj_types (event_id BIGINT, ts TIMESTAMP, event_type STRING)
            |PARTITIONED BY (days(ts))""".stripMargin)
    s.sql("""CREATE TABLE graft_lake.tspj_values (event_id BIGINT, ts TIMESTAMP, cents BIGINT)
            |PARTITIONED BY (days(ts))""".stripMargin)
    val ev = Tables.events(s, dir)
    ev.select(col("event_id"), col("ts"), col("event_type"))
      .writeTo("graft_lake.tspj_types").append()
    ev.select(col("event_id"), col("ts"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
      .writeTo("graft_lake.tspj_values").append()
    val lo = ev.agg(min(col("ts"))).collect()(0).getTimestamp(0)
    val hi = new java.sql.Timestamp(lo.getTime + 10L * 86400000L)
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition",
      "spark.sql.graft.preserve-data-grouping",
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.graft.preserve-data-grouping", "true")
      s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // the join clusters on (event_id, ts) — a SUPERSET of the
      // partitioning's references ({ts}): subset-compatibility is
      // exactly what this conf unlocks (Spark defaults to demanding
      // the clustering equal the partition keys verbatim)
      s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = s.table("graft_lake.tspj_types")
        .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      val b = s.table("graft_lake.tspj_values")
        .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      val j = a.join(b, Seq("event_id", "ts"))
      val joinExchanges = j.queryExecution.executedPlan.collect {
        case sj: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          sj.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
          }.length
      }
      require(joinExchanges.nonEmpty, "graft: p64 expected a sort-merge join")
      val res = j.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        .withColumn("join_exchanges", lit(joinExchanges.max.toLong))
        .orderBy(col("event_type"))
      val rows = res.collect()
      val stats = graft.sources.LakeStore.lastScanStats("graft_lake.tspj_types")
      val pruned = stats.groupsTotal - stats.groupsScanned
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), res.schema)
        .withColumn("groups_pruned_gt0", lit(if (pruned > 0) 1L else 0L))
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  val p64Sql: String =
    """WITH w AS (
      |  SELECT event_id, ts, event_type,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |  WHERE ts < (SELECT MIN(ts) FROM events) + INTERVAL 10 DAY)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(0 AS BIGINT) AS join_exchanges,
      |  CAST(1 AS BIGINT) AS groups_pruned_gt0
      |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- p65
  /** WRITE DISTRIBUTION & ORDERING — Iceberg's `write.distribution-mode`
    * as a DSv2 `RequiresDistributionAndOrdering` write: with the table
    * property set to `hash`, Spark shuffles incoming rows BY THE
    * PARTITION TRANSFORM before tasks write, so an append produces ONE
    * file per partition group instead of (input tasks x groups). This is
    * the writer-side scale property that keeps the manifest growing with
    * the DATA rather than with data x cluster width — on a 1000-executor
    * cluster writing a 4096-bucket table, mode=none means up to 4M files
    * PER APPEND, mode=hash means 4096. The clustering expression is the
    * transform itself (`bucket(8, doc_id)`), resolved through the same
    * [[graft.sources.LakeFunctions]] catalog the read-side SPJ uses —
    * write routing, read alignment and shuffle clustering are one
    * definition. Both appends carry identical rows, so the files audit
    * is isolated to layout.
    *
    * Inside the hash: doubled per-source aggregates (the same rows land
    * under both modes), `none_files` vs `hash_files` behavior flags
    * (adversarial 16-task input: none writes MORE files than groups,
    * hash writes EXACTLY one per group), and the group count. */
  def p65WriteDistribution(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.wdist"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, n_chars BIGINT)
             |PARTITIONED BY (bucket(8, doc_id))""".stripMargin)
    // adversarial input layout: 16 tasks, rows of every bucket in each
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .repartition(16)
    docs.writeTo(key).append() // v1: mode=none — every task hits every bucket
    s.sql(s"ALTER TABLE $key SET TBLPROPERTIES " +
      "('graft.write.distribution-mode' = 'hash')")
    docs.writeTo(key).append() // hash-clustered: one file per bucket
    val st = graft.sources.LakeStore.get(key).get
    def addedAt(v: Int): Int = st.addedAt(v).length
    val noneFiles = addedAt(1)
    val hashFiles = addedAt(st.latestVersion)
    val groups = st.current.map(_.group).distinct.size
    s.table(key)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("n_groups", lit(groups.toLong))
      .withColumn("none_exploded", lit(if (noneFiles > groups) 1L else 0L))
      .withColumn("hash_one_per_group", lit(if (hashFiles == groups) 1L else 0L))
      .orderBy(col("source"))
  }

  val p65Sql: String =
    """SELECT source, 2 * COUNT(*) AS n_rows,
      |  CAST(2 * SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(8 AS BIGINT) AS n_groups,
      |  CAST(1 AS BIGINT) AS none_exploded,
      |  CAST(1 AS BIGINT) AS hash_one_per_group
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p66
  /** COMPATIBLE BUCKET COUNTS + ONE-SIDE SHUFFLE — the two SPJ variants
    * that keep shuffles off MISMATCHED layouts. (1) A bucket(16, doc_id)
    * table joins a bucket(8, doc_id) table with ZERO exchanges: the
    * bucket function is a `ReducibleFunction`, so the 16-side reduces
    * each bucket id mod 8 — sound because `(h mod 16) mod 8 == h mod 8`
    * — and Spark aligns two fine groups onto each coarse one (Iceberg's
    * compatible-transforms behavior; at 100 TB this is what lets a
    * re-bucketed table keep joining its old-layout peers exchange-free
    * through a gradual migration). (2) The same bucketed table joins a
    * PLAIN unpartitioned view with exactly ONE exchange: Spark shuffles
    * only the unpartitioned side, computing its bucket ids by evaluating
    * the catalog's own `bucket` function — the storage side never moves
    * (`v2.bucketing.shuffle.enabled`).
    *
    * Inside the hash: per-source aggregates of the 16<->8 join,
    * `compat_exchanges` = 0, `oneside_exchanges` = 1 (the plain side's
    * single shuffle), and the one-side join's row count. */
  def p66CompatBucketJoin(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    s.sql("DROP TABLE IF EXISTS graft_lake.cb16")
    s.sql("DROP TABLE IF EXISTS graft_lake.cb8")
    s.sql("""CREATE TABLE graft_lake.cb16 (doc_id BIGINT, source STRING, n_chars BIGINT)
            |PARTITIONED BY (bucket(16, doc_id))""".stripMargin)
    s.sql("""CREATE TABLE graft_lake.cb8 (doc_id BIGINT, lang STRING)
            |PARTITIONED BY (bucket(8, doc_id))""".stripMargin)
    val docs = Tables.documents(s, dir)
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .writeTo("graft_lake.cb16").append()
    docs.select(col("doc_id"), col("lang"))
      .writeTo("graft_lake.cb8").append()
    docs.select(col("doc_id"), col("lang"))
      .createOrReplaceTempView("p66_plain")
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled",
      "spark.sql.sources.v2.bucketing.shuffle.enabled",
      "spark.sql.graft.preserve-data-grouping",
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.graft.preserve-data-grouping", "true")
      s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      s.conf.set("spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "true")
      s.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def joinExchanges(j: DataFrame): Int = {
        val counts = j.queryExecution.executedPlan.collect {
          case sj: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            sj.collect {
              case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
            }.length
        }
        require(counts.nonEmpty, "graft: p66 expected a sort-merge join")
        counts.max
      }
      val compat = s.table("graft_lake.cb16")
        .join(s.table("graft_lake.cb8"), "doc_id")
      val compatEx = joinExchanges(compat)
      val oneSide = s.table("graft_lake.cb16")
        .join(s.table("p66_plain").hint("SHUFFLE_MERGE"), "doc_id")
      val oneSideEx = joinExchanges(oneSide)
      val oneSideRows = oneSide.count()
      val res = compat.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          max(col("lang")).as("max_lang"))
        .withColumn("compat_exchanges", lit(compatEx.toLong))
        .withColumn("oneside_exchanges", lit(oneSideEx.toLong))
        .withColumn("oneside_rows", lit(oneSideRows))
        .orderBy(col("source"))
      val rows = res.collect()
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), res.schema)
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  val p66Sql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MAX(lang) AS max_lang,
      |  CAST(0 AS BIGINT) AS compat_exchanges,
      |  CAST(1 AS BIGINT) AS oneside_exchanges,
      |  CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS oneside_rows
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p67
  /** DESCRIBE DETAIL + MANIFEST FILE SIZES — Delta's `DESCRIBE DETAIL`
    * as a one-row `.detail` metadata table, fed by on-disk sizes the
    * manifest now carries per file (Iceberg/Delta both do): the writer
    * stats each closed parquet once at task commit, so "how big is this
    * table, how many files, how much delete debt" is a METADATA read —
    * no filesystem listing, no data scan, O(1) at 100 TB. The `.files`
    * table exposes the same per-file `bytes`, which is what maintenance
    * planning (compaction targets, vacuum audits) keys off.
    *
    * Inside the hash: the detail row's deterministic fields (row count,
    * file count under hash-distributed writes = groups x appends,
    * commit/ref/property counts, partition columns, name/format) plus
    * two size audits — size_bytes > 0 and sum(.files.bytes) ==
    * detail.size_bytes. */
  def p67DescribeDetail(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.dd"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, n_chars BIGINT)
             |PARTITIONED BY (source)
             |TBLPROPERTIES ('graft.write.distribution-mode' = 'hash')""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.writeTo(key).append() // v1: one file per source group
    docs.writeTo(key).append() // v2: again — num_files = 2 x groups
    val filesSum = s.sql(s"SELECT CAST(COALESCE(SUM(bytes), 0) AS BIGINT) FROM $key.files")
      .collect()(0).getLong(0)
    s.table(s"$key.detail")
      .withColumn("size_pos", lit(1L) * (col("size_bytes") > 0L).cast("long"))
      .withColumn("files_bytes_match",
        lit(1L) * (col("size_bytes") === lit(filesSum)).cast("long"))
      .select(col("name"), col("format"), col("num_files"), col("rows").as("n_rows"),
        col("partition_columns"), col("num_commits"), col("num_refs"),
        col("num_properties"), col("num_live_dvs"), col("num_eq_deletes"),
        col("size_pos"), col("files_bytes_match"))
  }

  val p67Sql: String =
    """SELECT 'graft_lake.dd' AS name, 'graft_lake' AS format,
      |  CAST(2 * COUNT(DISTINCT source) AS BIGINT) AS num_files,
      |  CAST(2 * COUNT(*) AS BIGINT) AS n_rows,
      |  'source' AS partition_columns,
      |  CAST(3 AS BIGINT) AS num_commits,
      |  CAST(1 AS BIGINT) AS num_refs,
      |  CAST(1 AS BIGINT) AS num_properties,
      |  CAST(0 AS BIGINT) AS num_live_dvs,
      |  CAST(0 AS BIGINT) AS num_eq_deletes,
      |  CAST(1 AS BIGINT) AS size_pos,
      |  CAST(1 AS BIGINT) AS files_bytes_match
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- p68
  /** AGGREGATE PUSHDOWN — COUNT(*)/COUNT(col)/MIN/MAX answered entirely
    * from the manifest (`SupportsPushDownAggregates`, complete-pushdown
    * only): row counts, WRITE-TIME NULL COUNTS (Iceberg's
    * null_value_counts, recorded per column per file by the writer) and
    * zone min/max produce the one final row with ZERO data files opened
    * — `SELECT count(*) FROM t` on a 100 TB table is a driver-side
    * metadata read. All-or-nothing with loud refusal gates: GROUP BY
    * (pre-evolution group keys are era-scoped), live DVs / equality
    * deletes (they hide rows the manifest counts), AVG/SUM/DISTINCT,
    * float/double (NaN never enters a zone) and string (UTF-16 manifest
    * order vs Catalyst's UTF-8) MIN/MAX — each falls back to reading
    * data with identical results.
    *
    * Inside the hash: the pushed aggregates (count star, a null-count-
    * driven COUNT(col), min/max of doc_id and n_chars) with
    * pushed_before=1 proving the manifest answered, then a merge-on-read
    * DELETE lands deletion vectors and the SAME aggregates recompute
    * from data (pushed_after=0) with the deleted rows gone. */
  def p68AggPushdown(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.aggpd"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, n_chars BIGINT, opt BIGINT)
             |PARTITIONED BY (source)
             |TBLPROPERTIES ('graft.merge-on-read' = 'true')""".stripMargin)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("n_chars"))
          .cast("bigint").as("opt"))
      .writeTo(key).append()
    def aggScans(df: DataFrame): Long = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[graft.sources.LakeAggScan] => b
    }.length.toLong
    val before = s.table(key).agg(
      count(lit(1)).as("n"), count(col("opt")).as("nopt"),
      min(col("doc_id")).as("mnid"), max(col("doc_id")).as("mxid"),
      min(col("n_chars")).as("mnch"), max(col("n_chars")).as("mxch"))
    val pushedBefore = aggScans(before)
    val b = before.collect()(0)
    s.sql(s"DELETE FROM $key WHERE doc_id % 100 = 0")
    val after = s.table(key).agg(count(lit(1)).as("n"), max(col("n_chars")).as("mxch"))
    val pushedAfter = aggScans(after)
    val a = after.collect()(0)
    s.range(1).select(
      lit(b.getLong(0)).as("n_before"), lit(b.getLong(1)).as("n_opt"),
      lit(b.getLong(2)).as("min_id"), lit(b.getLong(3)).as("max_id"),
      lit(b.getLong(4)).as("min_chars"), lit(b.getLong(5)).as("max_chars"),
      lit(pushedBefore).as("pushed_before"),
      lit(a.getLong(0)).as("n_after"), lit(a.getLong(1)).as("max_chars_after"),
      lit(pushedAfter).as("pushed_after"))
  }

  val p68Sql: String =
    """SELECT
      |  CAST(COUNT(*) AS BIGINT) AS n_before,
      |  CAST(COUNT(CASE WHEN doc_id % 3 = 0 THEN NULL ELSE n_chars END) AS BIGINT) AS n_opt,
      |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
      |  CAST(MAX(doc_id) AS BIGINT) AS max_id,
      |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      |  CAST(1 AS BIGINT) AS pushed_before,
      |  CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 100 <> 0) AS BIGINT) AS n_after,
      |  CAST((SELECT MAX(n_chars) FROM documents WHERE doc_id % 100 <> 0) AS BIGINT)
      |    AS max_chars_after,
      |  CAST(0 AS BIGINT) AS pushed_after
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- p69
  /** RUNTIME PARTITION FILTERING (dynamic partition pruning on DSv2 —
    * Iceberg's runtime filtering): the plain lake scan now implements
    * `SupportsRuntimeV2Filtering`, declaring its partition SOURCE
    * columns filterable, so a star join's dim-side filter executes
    * first (reusing the join's own broadcast), its distinct join-key
    * values arrive at the fact scan as an IN predicate BEFORE file
    * planning, and whole partition groups prune via their manifest
    * envelopes. The dim filter here is on a NON-join column, so no
    * static predicate can be inferred onto the fact side — every pruned
    * group is pruned at RUNTIME. At 100 TB this is the difference
    * between scanning the whole fact table and scanning the 7 of 20
    * sources the filtered dimension touches.
    *
    * Inside the hash: per-source aggregates of the pruned join plus the
    * scan's own audit — groups_total=20, groups_scanned=7 (from the
    * planning-time ScanStats channel) and dpp_used=1 (the executed plan
    * carries a dynamicpruningexpression on the fact scan). */
  def p69RuntimeFiltering(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val fact = "graft_lake.dppfact"
    val dimT = "graft_lake.dppdim"
    s.sql(s"DROP TABLE IF EXISTS $fact")
    s.sql(s"DROP TABLE IF EXISTS $dimT")
    s.sql(s"""CREATE TABLE $fact (doc_id BIGINT, source STRING, n_chars BIGINT)
             |PARTITIONED BY (source)
             |TBLPROPERTIES ('graft.write.distribution-mode' = 'hash')""".stripMargin)
    s.sql(s"CREATE TABLE $dimT (dsource STRING, w BIGINT)")
    val docs = Tables.documents(s, dir)
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .writeTo(fact).append()
    docs.select(col("source").as("dsource"))
      .distinct()
      .withColumn("w", substring(col("dsource"), 4, 10).cast("bigint") % 3L)
      .writeTo(dimT).append()
    val j = s.table(fact)
      .join(s.table(dimT).where(col("w") === 0L).hint("broadcast"),
        col("source") === col("dsource"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
      .orderBy(col("source"))
    val rows = j.collect()
    val stats = graft.sources.LakeStore.lastScanStats(fact)
    val dpp = j.queryExecution.executedPlan.toString.contains("dynamicpruningexpression")
    val base = s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), j.schema)
    base
      .withColumn("groups_total", lit(stats.groupsTotal.toLong))
      .withColumn("groups_scanned", lit(stats.groupsScanned.toLong))
      .withColumn("dpp_used", lit(if (dpp) 1L else 0L))
  }

  val p69Sql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST((SELECT COUNT(DISTINCT source) FROM documents) AS BIGINT) AS groups_total,
      |  CAST((SELECT COUNT(DISTINCT source) FROM documents
      |        WHERE CAST(SUBSTR(source, 4) AS INT) % 3 = 0) AS BIGINT) AS groups_scanned,
      |  CAST(1 AS BIGINT) AS dpp_used
      |FROM documents
      |WHERE CAST(SUBSTR(source, 4) AS INT) % 3 = 0
      |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- p70
  /** SNAPSHOT EXPIRY UNDER LIVE REFS (Iceberg's expire_snapshots rule:
    * a snapshot referenced by a branch or tag never expires). VACUUM's
    * keep-set is the retention window PLUS every live ref head — a tag
    * pinned BELOW the horizon keeps its files on disk and stays
    * readable by name after the sweep, while files referenced only by
    * expired, untagged history are physically deleted. At 100 TB this
    * is the difference between "retention reclaims space" and
    * "retention silently destroys the quarterly-audit tag".
    *
    * Inside the hash: the tag's aggregates read AFTER the vacuum (they
    * match the pre-rewrite corpus exactly), the current table's
    * aggregates (three whole-table UPDATE rewrites later), `vacuumed` = 1
    * (the sweep deleted at least one expired file), and
    * `tag_below_horizon` = 1 (the tag head predates the horizon — the
    * case that loses data without the ref-aware keep-set). */
  def p70ExpireRefs(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.expref"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, n_chars BIGINT)
             |PARTITIONED BY (source)
             |TBLPROPERTIES ('graft.write.distribution-mode' = 'hash')""".stripMargin)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .writeTo(key).append()                       // v1
    graft.sources.GraftLake.createTag(key, "audit") // v2 (metadata)
    s.sql(s"UPDATE $key SET n_chars = n_chars + 1") // v3: COW rewrite
    s.sql(s"UPDATE $key SET n_chars = n_chars + 1") // v4: COW rewrite
    s.sql(s"UPDATE $key SET n_chars = n_chars + 1") // v5: COW rewrite
    // retain {v4, v5}: v3's rewrite output is expired-and-untagged
    // (physically deleted); v1's files survive ONLY via the tag head
    val (deleted, horizon) = graft.sources.GraftLake.vacuum(key, 2)
    val tag = s.sql(s"SELECT * FROM $key VERSION AS OF 'audit'")
      .agg(count(lit(1)).as("tag_docs"),
        sum(col("n_chars")).cast("bigint").as("tag_chars"))
    val cur = s.table(key)
      .agg(count(lit(1)).as("cur_docs"),
        sum(col("n_chars")).cast("bigint").as("cur_chars"))
    tag.crossJoin(cur)
      .withColumn("vacuumed", lit(if (deleted > 0) 1L else 0L))
      .withColumn("tag_below_horizon", lit(if (horizon > 1) 1L else 0L))
  }

  val p70Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS tag_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS tag_chars,
      |  CAST(COUNT(*) AS BIGINT) AS cur_docs,
      |  CAST(SUM(n_chars) + 3 * COUNT(*) AS BIGINT) AS cur_chars,
      |  CAST(1 AS BIGINT) AS vacuumed,
      |  CAST(1 AS BIGINT) AS tag_below_horizon
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- p71
  /** SIZE-AWARE INCREMENTAL COMPACTION (Delta OPTIMIZE's small-file
    * bin-packing): the manifest's per-file `bytes` select which
    * partition groups need compacting (>= minInputFiles files under the
    * size threshold), and ONLY those groups rewrite through the
    * group-exact replaceWhere path — the maintenance job scales with
    * the small-file PROBLEM, not with the table. Here three whole
    * appends give every source 3 files and a fourth partial append
    * gives half the sources a 4th; compaction at minInputFiles=4 picks
    * exactly that half, packs each to ONE file, and a second pass finds
    * nothing left to do.
    *
    * Inside the hash: per-corpus aggregates BEFORE and AFTER (identical
    * — layout-only), groups_compacted / files_removed from the manifest
    * math (S_even groups, 4*S_even files), files_after =
    * S_even + 3*(S - S_even), and recompact_groups = 0 (idempotence). */
  def p71SmallFileCompaction(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.cmpct"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, n_chars BIGINT)
             |PARTITIONED BY (source)""".stripMargin)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    // one task per append -> ONE file per group per append: 3 each
    (1 to 3).foreach(_ => docs.repartition(1).writeTo(key).append())
    // half the sources get a 4th small file
    docs.filter(expr("cast(substr(source, 4) as int) % 2 = 0"))
      .repartition(1).writeTo(key).append()
    val before = s.table(key)
      .agg(count(lit(1)).as("docs_before"),
        sum(col("n_chars")).cast("bigint").as("chars_before"))
    val beforeRow = before.collect()(0)
    val (groups, removed) =
      graft.sources.GraftLake.compact(s, key, Long.MaxValue, minInputFiles = 4)
    val filesAfter = graft.sources.LakeStore.get(key).get.current.length
    val (g2, _) =
      graft.sources.GraftLake.compact(s, key, Long.MaxValue, minInputFiles = 4)
    s.table(key)
      .agg(count(lit(1)).as("docs_after"),
        sum(col("n_chars")).cast("bigint").as("chars_after"))
      .withColumn("docs_before", lit(beforeRow.getLong(0)))
      .withColumn("chars_before", lit(beforeRow.getLong(1)))
      .withColumn("groups_compacted", lit(groups.toLong))
      .withColumn("files_removed", lit(removed.toLong))
      .withColumn("files_after", lit(filesAfter.toLong))
      .withColumn("recompact_groups", lit(g2.toLong))
      .select(col("docs_before"), col("chars_before"), col("docs_after"),
        col("chars_after"), col("groups_compacted"), col("files_removed"),
        col("files_after"), col("recompact_groups"))
  }

  val p71Sql: String =
    """WITH s AS (SELECT COUNT(DISTINCT source) AS n FROM documents),
      |  se AS (SELECT COUNT(DISTINCT source) AS n FROM documents
      |         WHERE CAST(SUBSTR(source, 4) AS INT) % 2 = 0),
      |  d AS (SELECT CAST(3 * COUNT(*) +
      |          SUM(CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 2 = 0
      |            THEN 1 ELSE 0 END) AS BIGINT) AS docs,
      |        CAST(3 * SUM(n_chars) +
      |          SUM(CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 2 = 0
      |            THEN n_chars ELSE 0 END) AS BIGINT) AS chars
      |        FROM documents)
      |SELECT d.docs AS docs_before, d.chars AS chars_before,
      |  d.docs AS docs_after, d.chars AS chars_after,
      |  CAST(se.n AS BIGINT) AS groups_compacted,
      |  CAST(4 * se.n AS BIGINT) AS files_removed,
      |  CAST(se.n + 3 * (s.n - se.n) AS BIGINT) AS files_after,
      |  CAST(0 AS BIGINT) AS recompact_groups
      |FROM d, s, se""".stripMargin

  // ---------------------------------------------------------------- p72
  /** MANIFEST NDV STATISTICS (Iceberg's per-column `ndv` stat written
    * by ANALYZE, Delta's column statistics): every writer task folds a
    * K-minimum-values sketch per `graft.ndv.columns` column as rows
    * stream ([[graft.sources.LakeNdv]]), the manifest stores it
    * per file, and a table-level COUNT(DISTINCT)-quality answer is a
    * zero-I/O manifest fold — exact while every file holds < K=1024
    * distinct values (their union stays exact even ABOVE K), a
    * ±3.1%-RSE bottom-k estimate once any file saturates. The same fold
    * feeds Catalyst as `ColumnStatistics.distinctCount` through
    * [[graft.sources.LakeScan.estimateStatistics]] — join-size
    * estimation from write-time metadata, never an ANALYZE scan. At
    * 100 TB that is the difference between CBO having NDV and CBO
    * guessing from row counts.
    *
    * Two appends at repartition(2) give four files; the two enum
    * columns stay exact in every file (NDV is the true distinct
    * count), while o_orderkey/o_custkey saturate per-file sketches and
    * take the estimator path. Inside the hash: the exact NDVs for
    * low-cardinality columns, `est_ok` (exact columns answer exactly;
    * saturated columns land within 10% — 3.2 sigma at K=1024), and
    * full sketch coverage. */
  def p72NdvStats(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.ndvt"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key
             |(o_orderkey BIGINT, o_custkey BIGINT,
             | o_orderstatus STRING, o_orderpriority STRING)
             |TBLPROPERTIES ('graft.ndv.columns' =
             |  'o_orderkey,o_custkey,o_orderstatus,o_orderpriority')""".stripMargin)
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_orderpriority"))
    // two commits x repartition(2) = four files; each file sees ~1/4 of
    // the keyspace, far above K for the two id columns -> saturation
    orders.filter(col("o_orderkey") % 2 === 0).repartition(2)
      .writeTo(key).append()
    orders.filter(col("o_orderkey") % 2 =!= 0).repartition(2)
      .writeTo(key).append()
    val exact = orders.select(
      countDistinct(col("o_orderkey")).as("o_orderkey"),
      countDistinct(col("o_custkey")).as("o_custkey"),
      countDistinct(col("o_orderstatus")).as("o_orderstatus"),
      countDistinct(col("o_orderpriority")).as("o_orderpriority"))
      .selectExpr("stack(4, 'o_orderkey', o_orderkey, 'o_custkey', o_custkey," +
        " 'o_orderstatus', o_orderstatus, 'o_orderpriority', o_orderpriority)" +
        " as (col_name, ndv_exact)")
    s.table(s"$key.stats")
      .join(broadcast(exact), col("column") === col("col_name"))
      .select(
        col("col_name"),
        col("ndv_exact").cast("bigint").as("ndv_exact"),
        // hash-pin the exact answer where the sketch must BE exact
        // (global cardinality <= 64 keeps every file sketch below K)
        when(col("ndv_exact") <= 64, col("ndv")).otherwise(lit(-1L))
          .cast("bigint").as("ndv_small"),
        when(col("is_exact"), (col("ndv") === col("ndv_exact")).cast("bigint"))
          .otherwise((abs(col("ndv") / col("ndv_exact") - 1.0) <= 0.10)
            .cast("bigint")).as("est_ok"),
        (col("files_sketched") === col("files_total")).cast("bigint")
          .as("coverage_ok"))
      .orderBy(col("col_name"))
  }

  val p72Sql: String =
    """WITH e AS (
      |  SELECT 'o_orderkey' AS col_name,
      |    COUNT(DISTINCT o_orderkey) AS ndv_exact FROM orders
      |  UNION ALL SELECT 'o_custkey', COUNT(DISTINCT o_custkey) FROM orders
      |  UNION ALL SELECT 'o_orderstatus', COUNT(DISTINCT o_orderstatus) FROM orders
      |  UNION ALL SELECT 'o_orderpriority', COUNT(DISTINCT o_orderpriority) FROM orders)
      |SELECT col_name, CAST(ndv_exact AS BIGINT) AS ndv_exact,
      |  CAST(CASE WHEN ndv_exact <= 64 THEN ndv_exact ELSE -1 END AS BIGINT) AS ndv_small,
      |  CAST(1 AS BIGINT) AS est_ok,
      |  CAST(1 AS BIGINT) AS coverage_ok
      |FROM e ORDER BY col_name""".stripMargin

  // ---------------------------------------------------------------- p73
  /** POSITION-DELETE COMPACTION (Iceberg's
    * `rewrite_position_delete_files`, Delta's DV compaction): three
    * merge-on-read DELETEs leave up to three sidecars per data file,
    * and every scan of the file must open ALL of them — read
    * amplification that grows with write history. `CALL
    * graft_lake.system.rewrite_deletes` folds each file's sidecars
    * into one (merged, deduplicated, sorted) as a LAYOUT-ONLY commit:
    * no data file moves, visible rows are bit-identical, the change
    * feed sees nothing, and time travel to the pre-rewrite version
    * still reads the original sidecars. O(deleted positions) — the
    * cheap maintenance tier below p71's data-file compaction.
    *
    * Inside the hash: visible aggregates before/after/at the
    * pre-rewrite version (all equal), the sidecar ledger from the
    * delete-hit matrix (files x mod classes present), and zero CDC
    * rows out of the rewrite commit. */
  def p73RewriteDeletes(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.rwdel"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, n_chars BIGINT)
             |PARTITIONED BY (source)
             |TBLPROPERTIES ('graft.merge-on-read' = 'true')""".stripMargin)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .repartition(1) // one file per source group
      .writeTo(key).append() // v1
    s.sql(s"DELETE FROM $key WHERE doc_id % 97 = 0") // v2: 1st sidecar wave
    s.sql(s"DELETE FROM $key WHERE doc_id % 97 = 1") // v3: 2nd
    s.sql(s"DELETE FROM $key WHERE doc_id % 97 = 2") // v4: 3rd
    val preVersion = graft.sources.LakeStore.get(key).get.latestVersion
    val sidecarsBefore =
      graft.sources.LakeStore.get(key).get.deletes.length.toLong
    val beforeRow = s.table(key)
      .agg(count(lit(1)), sum(col("n_chars")).cast("bigint")).collect()(0)
    val proc = s.sql(
      s"CALL graft_lake.system.rewrite_deletes('rwdel', 2)").collect()(0)
    val postVersion = graft.sources.LakeStore.get(key).get.latestVersion
    // layout-only: the change feed across the rewrite commit is EMPTY
    val cdcRows = graft.sources.GraftLake
      .changes(s, key, preVersion, postVersion, "doc_id").count()
    val tt = s.sql(s"SELECT * FROM $key VERSION AS OF $preVersion")
      .agg(count(lit(1)), sum(col("n_chars")).cast("bigint")).collect()(0)
    s.table(key)
      .agg(count(lit(1)).as("docs_after"),
        sum(col("n_chars")).cast("bigint").as("chars_after"))
      .withColumn("docs_before", lit(beforeRow.getLong(0)))
      .withColumn("chars_before", lit(beforeRow.getLong(1)))
      .withColumn("docs_tt", lit(tt.getLong(0)))
      .withColumn("chars_tt", lit(tt.getLong(1)))
      .withColumn("sidecars_before", lit(sidecarsBefore))
      .withColumn("files_rewritten", lit(proc.getLong(0)))
      .withColumn("sidecars_removed", lit(proc.getLong(1)))
      .withColumn("sidecars_after", lit(proc.getLong(2)))
      .withColumn("cdc_rows", lit(cdcRows))
      .select(col("docs_before"), col("chars_before"), col("docs_after"),
        col("chars_after"), col("docs_tt"), col("chars_tt"),
        col("sidecars_before"), col("files_rewritten"),
        col("sidecars_removed"), col("sidecars_after"), col("cdc_rows"))
  }

  val p73Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |hit AS (SELECT source, doc_id % 97 AS m FROM d
      |        WHERE doc_id % 97 IN (0, 1, 2) GROUP BY source, doc_id % 97),
      |per AS (SELECT source, COUNT(*) AS k FROM hit GROUP BY source),
      |vis AS (SELECT CAST(COUNT(*) AS BIGINT) AS docs,
      |          CAST(SUM(n_chars) AS BIGINT) AS chars
      |        FROM d WHERE doc_id % 97 NOT IN (0, 1, 2))
      |SELECT vis.docs AS docs_before, vis.chars AS chars_before,
      |  vis.docs AS docs_after, vis.chars AS chars_after,
      |  vis.docs AS docs_tt, vis.chars AS chars_tt,
      |  CAST((SELECT COALESCE(SUM(k), 0) FROM per) AS BIGINT) AS sidecars_before,
      |  CAST((SELECT COUNT(*) FROM per WHERE k >= 2) AS BIGINT) AS files_rewritten,
      |  CAST((SELECT COALESCE(SUM(k - 1), 0) FROM per WHERE k >= 2) AS BIGINT)
      |    AS sidecars_removed,
      |  CAST((SELECT COUNT(*) FROM per) AS BIGINT) AS sidecars_after,
      |  CAST(0 AS BIGINT) AS cdc_rows
      |FROM vis""".stripMargin

  // ---------------------------------------------------------------- p74
  /** METADATA-ONLY DELETE (Iceberg's metadata delete, Delta's
    * partition-aligned DELETE): when every DELETE conjunct is an
    * `=`/`IN` on an identity partition column, Catalyst's
    * OptimizeMetadataOnlyDeleteFromTable swaps the planned row-level
    * rewrite for one [[graft.sources.GraftLakeTable.deleteWhere]] call
    * — the matching groups' files leave the manifest, NOTHING is
    * scanned or rewritten, and the commit is O(metadata). At 100 TB
    * "drop these two sources" costs milliseconds instead of a
    * partition rewrite; time travel and the change feed still see the
    * full row-level delete. A predicate the gate cannot decide from
    * group keys (here `doc_id % 11 = 4`) falls back to the planned
    * copy-on-write path unchanged.
    *
    * Inside the hash: visible aggregates after each step, ZERO new
    * files from the aligned delete (pure manifest removal) vs new
    * rewrite output from the fallback, the history action ledger
    * (the aligned commit lands as `delete`, the fallback as
    * `replace`), and the change feed's D-row count for the dropped
    * sources. */
  def p74MetadataDelete(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.mdel"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, source STRING, n_chars BIGINT)
             |PARTITIONED BY (source)""".stripMargin)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .repartition(col("source"))
      .writeTo(key).append() // v1: one file per source
    val pathsV1 = graft.sources.LakeStore.get(key).get.current.map(_.path).toSet
    s.sql(s"DELETE FROM $key WHERE source IN ('src3', 'src7')") // v2: aligned
    val stAligned = graft.sources.LakeStore.get(key).get
    val alignedNewFiles = stAligned.current.map(_.path).count(!pathsV1.contains(_))
    val alignedAction = stAligned.snapshots(stAligned.latestVersion).action
    val cdcD = graft.sources.GraftLake.changes(s, key, 1, 2, "doc_id")
      .filter(col("change") === "D").count()
    val afterAligned = s.table(key)
      .agg(count(lit(1)), sum(col("n_chars")).cast("bigint")).collect()(0)
    s.sql(s"DELETE FROM $key WHERE doc_id % 11 = 4") // v3: fallback rewrite
    val stFb = graft.sources.LakeStore.get(key).get
    val fbNewFiles = stFb.current.map(_.path).count(!pathsV1.contains(_))
    val fbAction = stFb.snapshots(stFb.latestVersion).action
    s.table(key)
      .agg(count(lit(1)).as("docs_final"),
        sum(col("n_chars")).cast("bigint").as("chars_final"))
      .withColumn("docs_aligned", lit(afterAligned.getLong(0)))
      .withColumn("chars_aligned", lit(afterAligned.getLong(1)))
      .withColumn("aligned_new_files", lit(alignedNewFiles.toLong))
      .withColumn("aligned_is_metadata_delete",
        lit(if (alignedAction == "delete") 1L else 0L))
      .withColumn("cdc_d_rows", lit(cdcD))
      .withColumn("fallback_rewrote", lit(if (fbNewFiles > 0) 1L else 0L))
      .withColumn("fallback_is_row_level",
        lit(if (fbAction == "replace") 1L else 0L))
      .select(col("docs_aligned"), col("chars_aligned"), col("docs_final"),
        col("chars_final"), col("aligned_new_files"),
        col("aligned_is_metadata_delete"), col("cdc_d_rows"),
        col("fallback_rewrote"), col("fallback_is_row_level"))
  }

  val p74Sql: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS docs,
      |        CAST(SUM(n_chars) AS BIGINT) AS chars
      |      FROM d WHERE source NOT IN ('src3', 'src7')),
      |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS docs,
      |        CAST(SUM(n_chars) AS BIGINT) AS chars
      |      FROM d WHERE source NOT IN ('src3', 'src7')
      |        AND NOT (doc_id % 11 = 4))
      |SELECT a.docs AS docs_aligned, a.chars AS chars_aligned,
      |  f.docs AS docs_final, f.chars AS chars_final,
      |  CAST(0 AS BIGINT) AS aligned_new_files,
      |  CAST(1 AS BIGINT) AS aligned_is_metadata_delete,
      |  CAST((SELECT COUNT(*) FROM d WHERE source IN ('src3', 'src7'))
      |    AS BIGINT) AS cdc_d_rows,
      |  CAST(1 AS BIGINT) AS fallback_rewrote,
      |  CAST(1 AS BIGINT) AS fallback_is_row_level
      |FROM a, f""".stripMargin

  // ---------------------------------------------------------------- p75
  /** STATS-DRIVEN BROADCAST — the payoff of
    * [[graft.sources.LakeScan.estimateStatistics]]: a DSv2 scan that
    * reports NO statistics defaults to `spark.sql.defaultSizeInBytes`
    * (Long.MaxValue — "assume huge"), so every lake-dim join would
    * sort-merge forever. The manifest-driven numbers (row counts AND
    * per-column zones/NDV, zero file I/O) let the STATIC planner pick
    * BroadcastHashJoin for the 25-row nation dim at the stock 10 MB
    * threshold — no AQE runtime correction needed, which at 100 TB
    * means the first attempt already skips the fact-side shuffle.
    * The audit is strict: adaptive OFF so the decision is provably
    * cost-model-from-manifest, bhj=1 / smj=0 counted from the executed
    * plan, and the dim scan's reported row count (exactly 25, straight
    * from manifest rows) inside the hash.
    *
    * Correctness rides along: per-nation customer counts and exact
    * decimal-summed balances against the DuckDB oracle. */
  def p75StatsBroadcast(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val dimKey = "graft_lake.bnation"
    val factKey = "graft_lake.bcust"
    s.sql(s"DROP TABLE IF EXISTS $dimKey")
    s.sql(s"DROP TABLE IF EXISTS $factKey")
    s.sql(s"CREATE TABLE $dimKey (n_nationkey INT, n_name STRING)")
    s.sql(s"""CREATE TABLE $factKey
             |(c_custkey BIGINT, c_nationkey INT, c_acctbal DOUBLE)""".stripMargin)
    Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      .writeTo(dimKey).append()
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .writeTo(factKey).append()
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false") // static decision only
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760") // stock 10 MB
      val j = s.table(factKey)
        .join(s.table(dimKey), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          Tables.dsum(col("c_acctbal"), 30, 2).as("sum_acctbal"))
      val plan = j.queryExecution.executedPlan
      val bhj = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.length
      val smj = plan.collect {
        case m: org.apache.spark.sql.execution.joins.SortMergeJoinExec => m
      }.length
      // the dim scan's own manifest-driven row count (what the cost
      // model consumed): exactly nation's 25 rows, no file opened
      val dimReported = s.table(dimKey).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[
            org.apache.spark.sql.connector.read.SupportsReportStatistics]
            .estimateStatistics().numRows().orElse(-1L)
      }.head
      val rows = j.collect() // materialize under the audited plan
      s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), j.schema)
        .withColumn("bhj_used", lit(bhj.toLong))
        .withColumn("smj_used", lit(smj.toLong))
        .withColumn("dim_reported_rows", lit(dimReported))
        .orderBy(col("n_name"))
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  val p75Sql: String =
    """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30, 2))) AS DOUBLE) AS DOUBLE)
      |    AS sum_acctbal,
      |  CAST(1 AS BIGINT) AS bhj_used,
      |  CAST(0 AS BIGINT) AS smj_used,
      |  CAST(25 AS BIGINT) AS dim_reported_rows
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- p76
  /** ANN OVER A CELL-PARTITIONED LAKE TABLE — the vector family's IVF
    * probing (s05) fused with the lake's partition pruning: embeddings
    * are STORED under their quantizer cell (`PARTITIONED BY (cell)`,
    * geometric nearest-centroid assignment, one file per cell via a
    * hash-clustered write), so a probe query's `cell IN (...)` filter
    * prunes whole partition groups at FILE-PLANNING time — the nProbe
    * recall/cost dial becomes "how many partition groups does the scan
    * even open". At 100 TB this is the ANN architecture that needs no
    * index server: the table IS the index, probing is partition
    * pruning, and re-clustering is an OPTIMIZE.
    *
    * Retrieval truth uses the s05 planted construction (queries are
    * tiny perturbations of base vectors, whose global argmax sits in
    * the probed cell set by construction), so DuckDB's corpus-wide
    * brute-force argmax equals the cell-scoped answer. Inside the
    * hash: the exact top-1 per query and `scan_pruned`=1 — the scan's
    * own ScanStats prove it opened fewer groups than the table holds
    * (4 queries probe <= 8 of the ~10 cells). */
  def p76AnnLakePruned(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    import SimilarityQueries.{embD, dot}
    val key = "graft_lake.annlake"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key
             |(vec_id BIGINT, cell INT, v ARRAY<DOUBLE>, norm DOUBLE)
             |PARTITIONED BY (cell)
             |TBLPROPERTIES ('graft.write.distribution-mode' = 'hash')""".stripMargin)
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    val cents = SimilarityQueries.codebook(e)
    e.withColumn("cell",
        element_at(SimilarityQueries.probeCells(cents, col("v"), 1), 1))
      .select(col("vec_id"), col("cell"), col("v"), col("norm"))
      .writeTo(key).append()
    val q = SimilarityQueries
      .plantedQueries(e.select(col("vec_id"), col("v")), k = 4, off = 171, factor = 0.1)
      .withColumn("qnorm", sqrt(dot("qv", "qv")))
    val probes = q.select(col("q_id"), col("qv"), col("qnorm"),
      explode(SimilarityQueries.probeCells(cents, col("qv"), 2)).as("cell"))
    // the probe set is driver-side (<= 2 * |queries| cell ids): the
    // scan's pushed IN predicate is what prunes partition groups
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val cand = s.table(key)
      .filter(col("cell").isin(probedCells.map(c => c: Any): _*))
      .join(broadcast(probes), Seq("cell"))
      .withColumn("cosine",
        floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val top = cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cosine"))
    val rows = top.collect() // materialize -> the scan records its stats
    val st = graft.sources.LakeStore.lastScanStats(key)
    s.createDataFrame(s.sparkContext.parallelize(rows.toSeq, 1), top.schema)
      .withColumn("scan_pruned",
        lit(if (st.groupsScanned < st.groupsTotal) 1L else 0L))
      .orderBy(col("q_id"))
  }

  val p76Sql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cnt AS (SELECT COUNT(*) AS n FROM e),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e b JOIN cnt ON TRUE JOIN e p ON p.vec_id = (b.vec_id + 171) % cnt.n
      |  WHERE b.vec_id < 4),
      |qn AS (
      |  SELECT q_id, qv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]), (x, y) -> x + y)) AS qnrm
      |  FROM q),
      |cn AS (
      |  SELECT vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |scored AS (
      |  SELECT q_id, vec_id AS neighbor_id,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * v[i]), (x, y) -> x + y)
      |      / (qnrm * nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM qn CROSS JOIN cn),
      |ranked AS (
      |  SELECT q_id, neighbor_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT q_id, neighbor_id, cosine, CAST(1 AS BIGINT) AS scan_pruned
      |FROM ranked WHERE rnk = 1 ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------- p77
  /** COPY INTO — idempotent file-level ingest (Delta's `COPY INTO`,
    * `CALL graft_lake.system.copy_into`): load every source file not
    * yet in the `graft.copyinto.loaded` ledger, where the ledger
    * update and the rows land in ONE commit — a crash can never ingest
    * data without recording it, so RE-RUNNING the same COPY INTO after
    * any failure (or on a schedule against a landing directory) is
    * always safe. The landing-zone pattern every 100 TB ingest
    * pipeline runs on: upstream drops files, a cron re-runs COPY INTO,
    * exactly-once at FILE granularity with a driver-side set lookup
    * per listed file.
    *
    * Inside the hash: three staged slices load once (3 files), the
    * immediate re-run loads ZERO, a later fourth slice loads exactly
    * one more, and the final table equals slices 1-4 by aggregate —
    * restated by the oracle from the corpus. */
  def p77CopyInto(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.landing"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"CREATE TABLE $key (doc_id BIGINT, source STRING, n_chars BIGINT)")
    val src = s"/tmp/graft_copyinto_${graft.Sidecars.tag(dir)}"
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.delete(new org.apache.hadoop.fs.Path(src), true)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    def stage(name: String, slice: DataFrame): Unit = {
      val tmp = s"$src/_stage_$name"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$src/$name.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    (0 to 2).foreach(i => stage(s"slice$i", docs.filter(col("doc_id") % 3 === i)))
    val first = s.sql(
      s"CALL graft_lake.system.copy_into('landing', '$src')").collect()(0)
    val rerun = s.sql(
      s"CALL graft_lake.system.copy_into('landing', '$src')").collect()(0)
    stage("slice3", docs.filter(col("doc_id") % 7 === 0))
    val incr = s.sql(
      s"CALL graft_lake.system.copy_into('landing', '$src')").collect()(0)
    s.table(key)
      .agg(count(lit(1)).as("docs_total"),
        sum(col("n_chars")).cast("bigint").as("chars_total"))
      .withColumn("first_files", lit(first.getLong(0)))
      .withColumn("first_rows", lit(first.getLong(1)))
      .withColumn("rerun_files", lit(rerun.getLong(0)))
      .withColumn("rerun_rows", lit(rerun.getLong(1)))
      .withColumn("incr_files", lit(incr.getLong(0)))
      .withColumn("incr_rows", lit(incr.getLong(1)))
      .select(col("docs_total"), col("chars_total"), col("first_files"),
        col("first_rows"), col("rerun_files"), col("rerun_rows"),
        col("incr_files"), col("incr_rows"))
  }

  val p77Sql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |s7 AS (SELECT COUNT(*) AS n, COALESCE(SUM(n_chars), 0) AS c
      |       FROM d WHERE doc_id % 7 = 0),
      |tot AS (SELECT COUNT(*) AS n, SUM(n_chars) AS c FROM d)
      |SELECT CAST(tot.n + s7.n AS BIGINT) AS docs_total,
      |  CAST(tot.c + s7.c AS BIGINT) AS chars_total,
      |  CAST(3 AS BIGINT) AS first_files,
      |  CAST(tot.n AS BIGINT) AS first_rows,
      |  CAST(0 AS BIGINT) AS rerun_files,
      |  CAST(0 AS BIGINT) AS rerun_rows,
      |  CAST(1 AS BIGINT) AS incr_files,
      |  CAST(s7.n AS BIGINT) AS incr_rows
      |FROM tot, s7""".stripMargin

  /** Leaf DSv2 table names of a query's OPTIMIZED plan, in join-tree
    * order — the plan-shape audit p78/p79 pin their reorder flags on.
    * One definition: the `.split('.').last` naming assumption lives
    * here and nowhere else. */
  private def v2LeafOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.relation.table.name().split('.').last
    }

  // ---------------------------------------------------------------- p78
  /** CBO JOIN REORDERING FROM MANIFEST NDV — the payoff p72's sketches
    * exist for (Iceberg feeds theta-sketch NDVs to Spark's CBO for
    * exactly this): a 3-table join written in a BAD syntactic order is
    * REORDERED by `CostBasedJoinReorder` only when the scans report
    * per-column distinctCount. The trap is a row-count mirage: dimA is
    * TINY (10 rows) so every size-only heuristic joins it first — but
    * its key has NDV=1 (every row matches every fact row: a 10x
    * fan-out), while dimB is 4x larger yet joins on a high-NDV key
    * that CONTRACTS the fact side. Only equi-join cardinality
    * estimation — |L⋈R| = |L||R|/max(ndv) — sees through the mirage,
    * and its NDV comes straight from the write-time manifest
    * ([[graft.sources.LakeScan.estimateStatistics]]: rows, zones, KMV
    * sketches — no ANALYZE scan). At 100 TB the reorder is the
    * difference between shuffling a 10x-exploded intermediate and
    * never materializing it.
    *
    * The audit runs the SAME query against twin table sets — one with
    * `graft.ndv.columns` sketches, one without — under identical CBO
    * confs, and pins BOTH optimized-plan leaf orders in the hash: with
    * NDV the contracting dim leads; without NDV the estimator has no
    * cardinalities, falls back to size, and the exploding syntactic
    * order survives. Correctness rides along: both plans' aggregates
    * equal DuckDB's. */
  def p78CboJoinReorder(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    def buildTables(suffix: String, withNdv: Boolean): (String, String, String) = {
      val (f, da, db) = (s"graft_lake.cbofact$suffix",
        s"graft_lake.cbodima$suffix", s"graft_lake.cbodimb$suffix")
      def ndvProp(cols: String): String =
        if (withNdv) s" TBLPROPERTIES ('graft.ndv.columns' = '$cols')" else ""
      Seq(f, da, db).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      s.sql(s"CREATE TABLE $f (doc_id BIGINT, ka INT, kb INT)" + ndvProp("ka,kb"))
      s.sql(s"CREATE TABLE $da (ka_d INT, wa BIGINT)" + ndvProp("ka_d"))
      s.sql(s"CREATE TABLE $db (kb_d INT, wb BIGINT)" + ndvProp("kb_d"))
      Tables.documents(s, dir).select(col("doc_id"),
          lit(0).cast("int").as("ka"), // NDV 1: the fan-out key
          (col("doc_id") % 100).cast("int").as("kb"))
        .repartition(2).writeTo(f).append()
      // 10 rows, ALL key 0: every fact row matches all ten (10x fan-out)
      s.range(0, 10).select(lit(0).cast("int").as("ka_d"),
        (col("id") * 3).as("wa")).coalesce(1).writeTo(da).append()
      // 4x larger than dimA, but contracts: 5 of fact.kb's 100 values
      s.range(0, 40).select((col("id") % 5).cast("int").as("kb_d"),
        (col("id") * 7).as("wb")).coalesce(1).writeTo(db).append()
      (f, da, db)
    }
    def leafOrder(df: DataFrame): String =
      v2LeafOrder(df).map(_.replaceAll("(_ndv|_raw)$", "")).mkString(">")
    def run(suffix: String, withNdv: Boolean): (String, org.apache.spark.sql.Row) = {
      val (f, da, db) = buildTables(suffix, withNdv)
      // bad syntactic order: the tiny 10-row fan-out dim joins before
      // the selective 40-row one
      val q = s.table(f)
        .join(s.table(da), col("ka") === col("ka_d"))
        .join(s.table(db), col("kb") === col("kb_d"))
        .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("sum_ids"),
          sum(col("wa") + col("wb")).as("sum_w"))
      (leafOrder(q), q.collect()(0))
    }
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.adaptive.enabled").map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false") // static decision only
      val (orderNdv, r) = run("_ndv", withNdv = true)
      val (orderRaw, r2) = run("_raw", withNdv = false)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(1), r.getLong(2),
          if (orderNdv == "cbofact>cbodimb>cbodima") 1L else 0L,
          if (orderRaw == "cbofact>cbodima>cbodimb") 1L else 0L,
          if (r == r2) 1L else 0L))
        .toDF("n_rows", "sum_ids", "sum_w", "ndv_reordered_selective_first",
          "raw_kept_syntactic_order", "orders_agree")
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  val p78Sql: String =
    """WITH f AS (SELECT doc_id, 0 AS ka, doc_id % 100 AS kb
      |           FROM documents),
      |da AS (SELECT 0 AS ka_d, 3 * i AS wa FROM generate_series(0, 9) t(i)),
      |db AS (SELECT i % 5 AS kb_d, 7 * i AS wb FROM generate_series(0, 39) t(i))
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(SUM(wa + wb) AS BIGINT) AS sum_w,
      |  CAST(1 AS BIGINT) AS ndv_reordered_selective_first,
      |  CAST(1 AS BIGINT) AS raw_kept_syntactic_order,
      |  CAST(1 AS BIGINT) AS orders_agree
      |FROM f JOIN da ON ka = ka_d JOIN db ON kb = kb_d""".stripMargin

  // ---------------------------------------------------------------- p79
  /** ANALYZE — NDV back-fill for tables created WITHOUT
    * `graft.ndv.columns` (Iceberg's `ANALYZE TABLE` writing puffin
    * stats; `CALL graft_lake.system.analyze(tbl, cols)`): one
    * distributed pass reads only the requested columns, folds a KMV
    * sketch per (file, column) on the executors (partials merge by
    * bottom-k union — K longs per file-column cross the shuffle, never
    * values), and ONE metadata-only commit attaches the sketches and
    * sets the roster so future appends sketch at write time. The
    * payoff is p78's: the same exploding-dim join that plans in
    * syntactic order against the un-analyzed tables REORDERS after the
    * three `CALL ... analyze` statements — CBO flipped by a metadata
    * commit, no rewrite, no restart. At 100 TB this is how a table
    * that was loaded before anyone thought about statistics joins like
    * one that always had them.
    *
    * Inside the hash: the pre-analyze syntactic order, the
    * post-analyze flip, files/columns analyzed per CALL, equal
    * aggregates from both plans, and CDC silence (dataChange=false:
    * the analyze commits are invisible to the change feed). */
  def p79AnalyzeBackfill(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val (f, da, db) = ("graft_lake.anzfact", "graft_lake.anzdima",
      "graft_lake.anzdimb")
    Seq(f, da, db).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    // NO ndv properties: these tables predate statistics
    s.sql(s"CREATE TABLE $f (doc_id BIGINT, ka INT, kb INT)")
    s.sql(s"CREATE TABLE $da (ka_d INT, wa BIGINT)")
    s.sql(s"CREATE TABLE $db (kb_d INT, wb BIGINT)")
    Tables.documents(s, dir).select(col("doc_id"),
        lit(0).cast("int").as("ka"), // NDV 1: the fan-out key
        (col("doc_id") % 100).cast("int").as("kb"))
      .repartition(2).writeTo(f).append()
    s.range(0, 10).select(lit(0).cast("int").as("ka_d"),
      (col("id") * 3).as("wa")).coalesce(1).writeTo(da).append()
    s.range(0, 40).select((col("id") % 5).cast("int").as("kb_d"),
      (col("id") * 7).as("wb")).coalesce(1).writeTo(db).append()
    def q: DataFrame = s.table(f)
      .join(s.table(da), col("ka") === col("ka_d"))
      .join(s.table(db), col("kb") === col("kb_d"))
      .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("sum_ids"),
        sum(col("wa") + col("wb")).as("sum_w"))
    def leafOrder(df: DataFrame): String = v2LeafOrder(df).mkString(">")
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.adaptive.enabled").map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val (orderBefore, rBefore) = (leafOrder(q), q.collect()(0))
      val vPre = graft.sources.LakeStore.get(f).get.latestVersion
      val calls = Seq(f -> "ka,kb", da -> "ka_d", db -> "kb_d").map {
        case (t, cs) => s.sql(
          s"CALL graft_lake.system.analyze('${t.split('.').last}', '$cs')")
          .collect()(0)
      }
      // the analyze commits are CDC-invisible (dataChange=false)
      val cdc = graft.sources.GraftLake.changes(s, f, vPre,
        graft.sources.LakeStore.get(f).get.latestVersion, "doc_id").count()
      val (orderAfter, rAfter) = (leafOrder(q), q.collect()(0))
      import s.implicits._
      Seq((rAfter.getLong(0), rAfter.getLong(1), rAfter.getLong(2),
          if (orderBefore == "anzfact>anzdima>anzdimb") 1L else 0L,
          if (orderAfter == "anzfact>anzdimb>anzdima") 1L else 0L,
          if (rBefore == rAfter) 1L else 0L,
          calls.head.getLong(0), calls.map(_.getLong(1)).sum, cdc))
        .toDF("n_rows", "sum_ids", "sum_w", "before_syntactic_order",
          "after_reordered", "results_agree", "fact_files_analyzed",
          "columns_sketched", "cdc_rows")
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  // ---------------------------------------------------------------- p80
  /** CBO REORDER x AQE COMPOSITION — the production configuration p78
    * deliberately isolated away (it pinned the static decision with
    * AQE off): real clusters run AQE ON, and the question that matters
    * at 100 TB is whether the manifest-NDV reorder still lands there.
    * It does, by architecture: `CostBasedJoinReorder` is a STATIC
    * logical rule that runs before any physical planning, while AQE
    * reoptimizes PHYSICAL subtrees from runtime shuffle/broadcast
    * statistics — it can re-pick join STRATEGIES (sort-merge ->
    * broadcast) but never re-orders the logical join tree it was
    * handed. So the static NDV decision is exactly the one AQE
    * inherits, and it must be right BEFORE execution: the join order
    * decides which intermediate gets materialized at all, and the
    * 10x-exploded intermediate the bad order builds is the very first
    * shuffle — runtime adaptivity only sees it after paying for it.
    *
    * The audit is p78's twin-table construction with
    * `spark.sql.adaptive.enabled=true`: the NDV twin's OPTIMIZED plan
    * still leads with the contracting dim, the stats-less twin still
    * keeps the bad syntactic order, both EXECUTED plans are adaptive
    * (AdaptiveSparkPlanExec roots), and AQE composes on top — the
    * final adaptive plan broadcasts both tiny dims. All four flags +
    * both aggregates in the oracle hash. */
  def p80CboReorderUnderAqe(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    def buildTables(suffix: String, withNdv: Boolean): (String, String, String) = {
      val (f, da, db) = (s"graft_lake.cbofact$suffix",
        s"graft_lake.cbodima$suffix", s"graft_lake.cbodimb$suffix")
      def ndvProp(cols: String): String =
        if (withNdv) s" TBLPROPERTIES ('graft.ndv.columns' = '$cols')" else ""
      Seq(f, da, db).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      s.sql(s"CREATE TABLE $f (doc_id BIGINT, ka INT, kb INT)" + ndvProp("ka,kb"))
      s.sql(s"CREATE TABLE $da (ka_d INT, wa BIGINT)" + ndvProp("ka_d"))
      s.sql(s"CREATE TABLE $db (kb_d INT, wb BIGINT)" + ndvProp("kb_d"))
      Tables.documents(s, dir).select(col("doc_id"),
          lit(0).cast("int").as("ka"),
          (col("doc_id") % 100).cast("int").as("kb"))
        .repartition(2).writeTo(f).append()
      s.range(0, 10).select(lit(0).cast("int").as("ka_d"),
        (col("id") * 3).as("wa")).coalesce(1).writeTo(da).append()
      s.range(0, 40).select((col("id") % 5).cast("int").as("kb_d"),
        (col("id") * 7).as("wb")).coalesce(1).writeTo(db).append()
      (f, da, db)
    }
    def leafOrder(df: DataFrame): String =
      v2LeafOrder(df).map(_.replaceAll("(_qaqe|_raqe)$", "")).mkString(">")
    // the FINAL adaptive physical plan, after execution materialized it.
    // Spark 4 wraps materialized stages in QueryStageExec nodes (result
    // stage included) whose children are Nil — a plain collect() sees
    // nothing below a stage boundary, so walk through `stage.plan`.
    def countBhj(p: org.apache.spark.sql.execution.SparkPlan): Long = {
      val self = p match {
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => 1L
        case _ => 0L
      }
      val kids = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(countBhj).sum
    }
    def finalPlan(df: DataFrame): (Long, Long) = {
      df.collect()
      df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          (1L, countBhj(a.executedPlan))
        case _ => (0L, 0L)
      }
    }
    def run(suffix: String, withNdv: Boolean)
        : (String, org.apache.spark.sql.Row, Long, Long) = {
      val (f, da, db) = buildTables(suffix, withNdv)
      val q = s.table(f)
        .join(s.table(da), col("ka") === col("ka_d"))
        .join(s.table(db), col("kb") === col("kb_d"))
        .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("sum_ids"),
          sum(col("wa") + col("wb")).as("sum_w"))
      val order = leafOrder(q)
      val (adaptive, bhj) = finalPlan(q)
      (order, q.collect()(0), adaptive, bhj)
    }
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.adaptive.enabled").map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "true") // the production mode
      val (orderNdv, r, adaptN, bhjN) = run("_qaqe", withNdv = true)
      val (orderRaw, r2, adaptR, _) = run("_raqe", withNdv = false)
      import s.implicits._
      Seq((r.getLong(0), r.getLong(1), r.getLong(2),
          if (orderNdv == "cbofact>cbodimb>cbodima") 1L else 0L,
          if (orderRaw == "cbofact>cbodima>cbodimb") 1L else 0L,
          if (r == r2) 1L else 0L,
          adaptN * adaptR, // both executed plans adaptive
          if (bhjN >= 2) 1L else 0L)) // AQE/planner broadcast both dims
        .toDF("n_rows", "sum_ids", "sum_w", "ndv_reordered_under_aqe",
          "raw_kept_syntactic_order", "orders_agree", "plans_adaptive",
          "both_dims_broadcast")
    } finally saved.foreach { case (k, vOpt) =>
      vOpt.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  // ---------------------------------------------------------------- p81
  /** PAGED-HISTORY READS — the round-15 snapshot rebuild exercised
    * end-to-end in the ORACLE board, not just specs: 35 single-slice
    * appends push the oldest commits past the paging window (their
    * deltas leave driver memory entirely; the log entry is the durable
    * copy), then every read class that touches deep history runs
    * against the paged state — (a) time travel to a version whose
    * whole parent chain is paged (VERSION AS OF 10: reconstruction
    * reloads each commit's add-list from the log), (b) a fresh
    * full-history stream drain (paged commits deliver from their own
    * log entries, O(1) file read per commit — Delta reading commit
    * JSONs), (c) the change feed over the entire version range. At
    * 100 TB this is the contract that lets a table hold years of
    * history while the driver holds one live list plus a window: cold
    * history costs a log read WHEN ASKED FOR, never resident memory.
    * `paged_ok`/`reloaded_ok` pin that the probe actually ran against
    * paged state (>= 5 paged commits, > 0 log reloads) — without them
    * a shrunk corpus or widened window would silently turn this row
    * into a no-op. */
  def p81PagedHistoryReads(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.pagedhist"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"CREATE TABLE $key (doc_id BIGINT, n_chars BIGINT)")
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    (0 until 35).foreach { i => // v1..v35; window 24 pages v1..v11
      docs.filter(col("doc_id") % 35 === i).coalesce(1).writeTo(key).append()
    }
    val st = graft.sources.LakeStore.get(key).get
    val pagedOk =
      if (st.snapshots.count(_.paged) >= 5) 1L else 0L
    val reloads0 = graft.sources.LakeStore.deltaReloads.get()
    // (a) time travel through the fully-paged prefix
    val tt = s.sql(s"SELECT COUNT(*) AS n, CAST(COALESCE(SUM(n_chars), 0) " +
      s"AS BIGINT) AS c FROM $key VERSION AS OF 10").collect()(0)
    val reloadedOk =
      if (graft.sources.LakeStore.deltaReloads.get() > reloads0) 1L else 0L
    // (b) fresh full-history stream drain across the paged commits
    val root = s"/tmp/graft_p81_${graft.Sidecars.tag(dir)}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val sRows = new java.util.concurrent.atomic.AtomicLong(0L)
    val sChars = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = s.readStream.table(key)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val r = b.agg(count(lit(1)), coalesce(sum(col("n_chars")), lit(0L)))
          .collect()(0)
        sRows.addAndGet(r.getLong(0))
        sChars.addAndGet(r.getLong(1))
        ()
      }
      .option("checkpointLocation", s"$root/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // (c) the change feed over the whole range (all inserts)
    val cdc = graft.sources.GraftLake
      .changes(s, key, 0, st.latestVersion, "doc_id").count()
    val tot = s.table(key)
      .agg(count(lit(1)), coalesce(sum(col("n_chars")), lit(0L))).collect()(0)
    import s.implicits._
    Seq((tot.getLong(0), tot.getLong(1),
        tt.getLong(0), tt.getLong(1),
        sRows.get(), sChars.get(), cdc, pagedOk, reloadedOk))
      .toDF("total_rows", "total_chars", "tt10_rows", "tt10_chars",
        "stream_rows", "stream_chars", "cdc_rows", "paged_ok", "reloaded_ok")
  }

  val p81Sql: String =
    """SELECT
      |  CAST(COUNT(*) AS BIGINT) AS total_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(CASE WHEN doc_id % 35 < 10 THEN 1 ELSE 0 END) AS BIGINT) AS tt10_rows,
      |  CAST(SUM(CASE WHEN doc_id % 35 < 10 THEN n_chars ELSE 0 END) AS BIGINT) AS tt10_chars,
      |  CAST(COUNT(*) AS BIGINT) AS stream_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS stream_chars,
      |  CAST(COUNT(*) AS BIGINT) AS cdc_rows,
      |  CAST(1 AS BIGINT) AS paged_ok,
      |  CAST(1 AS BIGINT) AS reloaded_ok
      |FROM documents""".stripMargin

  val p80Sql: String =
    """WITH f AS (SELECT doc_id, 0 AS ka, doc_id % 100 AS kb
      |           FROM documents),
      |da AS (SELECT 0 AS ka_d, 3 * i AS wa FROM generate_series(0, 9) t(i)),
      |db AS (SELECT i % 5 AS kb_d, 7 * i AS wb FROM generate_series(0, 39) t(i))
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(SUM(wa + wb) AS BIGINT) AS sum_w,
      |  CAST(1 AS BIGINT) AS ndv_reordered_under_aqe,
      |  CAST(1 AS BIGINT) AS raw_kept_syntactic_order,
      |  CAST(1 AS BIGINT) AS orders_agree,
      |  CAST(1 AS BIGINT) AS plans_adaptive,
      |  CAST(1 AS BIGINT) AS both_dims_broadcast
      |FROM f JOIN da ON ka = ka_d JOIN db ON kb = kb_d""".stripMargin

  val p79Sql: String =
    """WITH f AS (SELECT doc_id, 0 AS ka, doc_id % 100 AS kb
      |           FROM documents),
      |da AS (SELECT 0 AS ka_d, 3 * i AS wa FROM generate_series(0, 9) t(i)),
      |db AS (SELECT i % 5 AS kb_d, 7 * i AS wb FROM generate_series(0, 39) t(i))
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |  CAST(SUM(wa + wb) AS BIGINT) AS sum_w,
      |  CAST(1 AS BIGINT) AS before_syntactic_order,
      |  CAST(1 AS BIGINT) AS after_reordered,
      |  CAST(1 AS BIGINT) AS results_agree,
      |  CAST(2 AS BIGINT) AS fact_files_analyzed,
      |  CAST(4 AS BIGINT) AS columns_sketched,
      |  CAST(0 AS BIGINT) AS cdc_rows
      |FROM f JOIN da ON ka = ka_d JOIN db ON kb = kb_d""".stripMargin

  // ---------------------------------------------------------------- p82
  /** ANN UNDER ROW-LEVEL DELETES — p76's cell-partitioned lake ANN with
    * both delete flavors applied to the vector table, pinning that the
    * SCAN SUBSTRATE (deletion-vector subtraction + equality-delete
    * sequence gates) removes dead vectors from every ANN shortlist:
    * a merge-on-read DELETE hides two query bases by position vector,
    * and a keyed upsert re-versions two more bases with NEGATED vectors
    * (equality delete kills the old versions; the new versions score
    * cosine ~ -1 and can never rank). The retrieval then runs the full
    * verify-stage brute force over the post-delete table — top-1 per
    * query must be the corpus argmax EXCLUDING the dead rows, which the
    * oracle restates from the raw corpus. Guard flags ride the hash:
    * `dv_excluded` (no DV-deleted id survives a scan) and `eq_excluded`
    * (each upserted key resolves to exactly ONE live version). Without
    * this row, a future scan-path optimization could silently leak
    * deleted vectors back into ANN results — at 100 TB the same
    * substrate serves the p76 partition-pruned probe path, so exclusion
    * proven here covers it. */
  def p82AnnUnderDeletes(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    import SimilarityQueries.{embD, dot}
    val key = "graft_lake.annled"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key
             |(vec_id BIGINT, cell INT, v ARRAY<DOUBLE>, norm DOUBLE)
             |PARTITIONED BY (cell)
             |TBLPROPERTIES ('graft.write.distribution-mode' = 'hash',
             |               'graft.merge-on-read' = 'true')""".stripMargin)
    val e = Tables.spread(Tables.embeddings(s, dir)).withColumn("v", embD)
      .withColumn("norm", sqrt(dot("v", "v")))
      .select(col("vec_id"), col("label"), col("v"), col("norm"))
    val cents = SimilarityQueries.codebook(e)
    def withCell(df: DataFrame): DataFrame = df.withColumn("cell",
        element_at(SimilarityQueries.probeCells(cents, col("v"), 1), 1))
      .select(col("vec_id"), col("cell"), col("v"), col("norm"))
    withCell(e).writeTo(key).append()
    // queries derive from the SOURCE corpus (their bases exist before
    // the deletes — that is the point: the dead bases WERE the argmax)
    val qn = SimilarityQueries
      .plantedQueries(e.select(col("vec_id"), col("v")), k = 4, off = 171, factor = 0.1)
      .withColumn("qnorm", sqrt(dot("qv", "qv")))
    // delete flavor 1: merge-on-read DELETE — queries 0/1 lose their
    // bases to position-delete vectors over untouched files
    s.sql(s"DELETE FROM $key WHERE vec_id IN (0, 1)")
    // delete flavor 2: keyed upsert — queries 2/3's bases re-version
    // with negated vectors (old versions die via the equality delete's
    // sequence gate; cosine against a negated self is ~ -1)
    val negated = withCell(
      e.filter(col("vec_id").isin(2L, 3L))
        .withColumn("v", expr("transform(v, x -> -x)")))
    graft.sources.GraftLake.upsert(negated, key, Seq("vec_id"))
    val tbl = s.table(key)
    // guard flags: the scan substrate must show the dead rows GONE
    val dvGone = tbl.filter(col("vec_id").isin(0L, 1L)).count() == 0L
    val eqSingle = tbl.filter(col("vec_id").isin(2L, 3L)).count() == 2L
    // verify-stage brute force over the post-delete table: the 4-row
    // query side broadcasts, the corpus side streams — no shuffle
    val cand = tbl.crossJoin(broadcast(qn))
      .withColumn("cosine",
        floor(dot("qv", "v") / (col("qnorm") * col("norm")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cosine"),
        lit(if (dvGone) 1L else 0L).as("dv_excluded"),
        lit(if (eqSingle) 1L else 0L).as("eq_excluded"))
      .orderBy(col("q_id"))
  }

  /** Brute-force argmax over the post-delete corpus, restated from the
    * raw parquet: ids 0/1 excluded (DV-deleted), ids 2/3 negated (the
    * upsert's live versions). Guard flags asserted at 1. */
  val p82Sql: String =
    """WITH e0 AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cnt AS (SELECT COUNT(*) AS n FROM e0),
      |q AS (
      |  SELECT b.vec_id AS q_id,
      |    list_transform(generate_series(1, 64), i -> b.v[i] + 0.1 * p.v[i]) AS qv
      |  FROM e0 b JOIN cnt ON TRUE JOIN e0 p ON p.vec_id = (b.vec_id + 171) % cnt.n
      |  WHERE b.vec_id < 4),
      |qn AS (
      |  SELECT q_id, qv,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]), (x, y) -> x + y)) AS qnrm
      |  FROM q),
      |e AS (
      |  SELECT vec_id,
      |    CASE WHEN vec_id IN (2, 3) THEN list_transform(v, x -> -x) ELSE v END AS v
      |  FROM e0 WHERE vec_id NOT IN (0, 1)),
      |cn AS (
      |  SELECT vec_id, v,
      |    SQRT(list_reduce(list_transform(generate_series(1, 64), i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e),
      |scored AS (
      |  SELECT q_id, vec_id AS neighbor_id,
      |    FLOOR(list_reduce(list_transform(generate_series(1, 64), i -> qv[i] * v[i]), (x, y) -> x + y)
      |      / (qnrm * nrm) * 1e6 + 0.5) / 1e6 AS cosine
      |  FROM qn CROSS JOIN cn),
      |ranked AS (
      |  SELECT q_id, neighbor_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |  FROM scored)
      |SELECT q_id, neighbor_id, cosine,
      |  CAST(1 AS BIGINT) AS dv_excluded, CAST(1 AS BIGINT) AS eq_excluded
      |FROM ranked WHERE rnk = 1 ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------- p83
  /** UPSERT-HEAVY CDC WITH A STATS-BOUNDED PLAN — the read-amplification
    * contract that makes a change feed of keyed upserts consumable at
    * 800k files: each upsert commit's delete-side fan-out may touch only
    * the files whose per-file statistics ADMIT the deleted keys, never
    * O(live files). The corpus is written as 8 appends INTERLEAVED on
    * `doc_id % 8`, so every file's min/max zone spans the whole id range
    * and zones can prove nothing — the write-time bloom filters
    * (`graft.bloom.columns`) are the only statistics that can bound the
    * plan. Four upserts then re-score key slices congruent to u mod 8;
    * each slice's keys live in exactly ONE append file, so the planner
    * must emit 4 fan-out chunks total (one per upsert) and prune the
    * other 34 candidates (7 foreign appends per upsert + every earlier
    * upsert's own file). Both counts ride the hash as guard flags —
    * emitted from the actual planner counters, not the construction —
    * and the row-level feed totals are restated by DuckDB from the raw
    * documents table. A regression that fans out O(live) again flips
    * `fanout_pruned`; one that over-prunes (unsound bloom/zone/null
    * logic) loses D rows and flips `d_rows`/`d_chars`. */
  def p83UpsertCdcPruned(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.cdcprune"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, n_chars BIGINT)
             |TBLPROPERTIES ('graft.bloom.columns' = 'doc_id')""".stripMargin)
    val docs = Tables.documents(s, dir)
      .filter(col("doc_id") < 400).select(col("doc_id"), col("n_chars"))
    (0 until 8).foreach { j =>
      docs.filter(col("doc_id") % 8 === j).coalesce(1).writeTo(key).append()
    }
    val v0 = graft.sources.LakeStore.get(key).get.latestVersion
    (0 until 4).foreach { u =>
      graft.sources.GraftLake.upsert(
        docs.filter(col("doc_id") < 40 && col("doc_id") % 8 === u)
          .withColumn("n_chars", col("n_chars") + 1000000L).coalesce(1),
        key, Seq("doc_id"))
    }
    val st = graft.sources.LakeStore.get(key).get
    import graft.sources.LakeCdf
    val e0 = LakeCdf.upsertFanoutEmitted.get()
    val pr0 = LakeCdf.upsertFanoutPruned.get()
    LakeCdf.chunksForRange(key, st, v0 + 1, st.latestVersion)
    val emitted = LakeCdf.upsertFanoutEmitted.get() - e0
    val pruned = LakeCdf.upsertFanoutPruned.get() - pr0
    val feed = s.read.option("startingVersion", (v0 + 1).toString)
      .table(s"$key.changes")
    feed.agg(
      sum(when(col("_change") === "I", 1L).otherwise(0L)).as("i_rows"),
      sum(when(col("_change") === "D", 1L).otherwise(0L)).as("d_rows"),
      sum(when(col("_change") === "D", col("n_chars")).otherwise(0L)).as("d_chars"),
      sum(when(col("_change") === "I", col("n_chars")).otherwise(0L)).as("i_chars"))
      .withColumn("fanout_emitted", lit(emitted))
      .withColumn("fanout_pruned", lit(pruned))
  }

  val p83Sql: String =
    """WITH s AS (
      |  SELECT doc_id, n_chars FROM documents
      |  WHERE doc_id < 40 AND doc_id % 8 < 4)
      |SELECT CAST(COUNT(*) AS BIGINT) AS i_rows,
      |  CAST(COUNT(*) AS BIGINT) AS d_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS d_chars,
      |  CAST(SUM(n_chars + 1000000) AS BIGINT) AS i_chars,
      |  CAST(4 AS BIGINT) AS fanout_emitted,
      |  CAST(34 AS BIGINT) AS fanout_pruned
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- p84
  /** CHANGE FEED THROUGH A RESTORE — a version range whose INTERIOR
    * crosses a rollback of BOTH row-level delete flavors. What the row
    * pins: (a) the range planner needs exactly ONE live-map seed even
    * across the restore (main lineage stays contiguous — a restore
    * re-ADDS old content under a new version rather than re-pointing
    * history), measured from the planner's own counter and carried as
    * `seed_ok`; (b) the restore commit's deltas are EXACT row-level
    * changes — the rolled-back upsert's batch dies (D), the old row
    * versions its equality delete hid resurrect (I), and the positions
    * a rolled-back merge-on-read DELETE's vector hid resurrect (I,
    * include-mode on the vanished vector). DuckDB restates every
    * aggregate from the raw documents table via the deterministic
    * construction, so a planner that re-seeds, drops a resurrection, or
    * double-delivers flips a hashed column. */
  def p84RestoreRangeCdf(s: SparkSession, dir: String): DataFrame = {
    registerLake(s)
    val key = "graft_lake.cdfrest"
    s.sql(s"DROP TABLE IF EXISTS $key")
    s.sql(s"""CREATE TABLE $key (doc_id BIGINT, n_chars BIGINT)
             |TBLPROPERTIES ('graft.merge-on-read' = 'true')""".stripMargin)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    docs.filter(col("doc_id") < 100).coalesce(1).writeTo(key).append() // v1
    docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .coalesce(1).writeTo(key).append() // v2
    s.sql(s"DELETE FROM $key WHERE doc_id = 150") // v3: MoR position vector
    graft.sources.GraftLake.upsert( // v4: equality-delete upsert
      docs.filter(col("doc_id").isin(10L, 11L))
        .withColumn("n_chars", col("n_chars") + 1000000L).coalesce(1),
      key, Seq("doc_id"))
    graft.sources.GraftLake.restore(key, 2) // v5: roll back both deletes
    val st = graft.sources.LakeStore.get(key).get
    import graft.sources.LakeCdf
    val s0 = LakeCdf.rangeSeeds.get()
    LakeCdf.chunksForRange(key, st, 1, st.latestVersion)
    val seedOk = if (LakeCdf.rangeSeeds.get() - s0 == 1L) 1L else 0L
    val feed = s.read.option("startingVersion", "1").table(s"$key.changes")
    val tot = s.table(key)
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("c")).collect()(0)
    feed.agg(
      sum(when(col("_change") === "I", 1L).otherwise(0L)).as("i_rows"),
      sum(when(col("_change") === "D", 1L).otherwise(0L)).as("d_rows"),
      sum(when(col("_change") === "I", col("n_chars")).otherwise(0L)).as("i_chars"),
      sum(when(col("_change") === "D", col("n_chars")).otherwise(0L)).as("d_chars"))
      .withColumn("final_rows", lit(tot.getLong(0)))
      .withColumn("final_chars", lit(tot.getLong(1)))
      .withColumn("seed_ok", lit(seedOk))
  }

  /** a = Σ chars(doc_id<200); b = Σ chars({10,11}); c = chars(150).
    * I rows: 200 appends + 2 upserted + 2 eq-resurrected + 1
    * DV-resurrected = 205, chars a + 2b + c + 2,000,000.
    * D rows: the MoR delete, the upsert's 2 implicit deletes, and the
    * restore killing the upsert batch = 5, chars 2b + c + 2,000,000.
    * The final table is exactly the v2 snapshot. */
  val p84Sql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents WHERE doc_id < 200)
      |SELECT CAST(205 AS BIGINT) AS i_rows,
      |  CAST(5 AS BIGINT) AS d_rows,
      |  CAST(SUM(n_chars)
      |    + 2 * SUM(CASE WHEN doc_id IN (10, 11) THEN n_chars ELSE 0 END)
      |    + SUM(CASE WHEN doc_id = 150 THEN n_chars ELSE 0 END)
      |    + 2000000 AS BIGINT) AS i_chars,
      |  CAST(2 * SUM(CASE WHEN doc_id IN (10, 11) THEN n_chars ELSE 0 END)
      |    + SUM(CASE WHEN doc_id = 150 THEN n_chars ELSE 0 END)
      |    + 2000000 AS BIGINT) AS d_chars,
      |  CAST(COUNT(*) AS BIGINT) AS final_rows,
      |  CAST(SUM(n_chars) AS BIGINT) AS final_chars,
      |  CAST(1 AS BIGINT) AS seed_ok
      |FROM d""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p84_restore_range_cdf" -> (p84RestoreRangeCdf _),
    "p83_upsert_cdc_pruned" -> (p83UpsertCdcPruned _),
    "p82_ann_under_deletes" -> (p82AnnUnderDeletes _),
    "p81_paged_history_reads" -> (p81PagedHistoryReads _),
    "p80_cbo_reorder_under_aqe" -> (p80CboReorderUnderAqe _),
    "p79_analyze_backfill" -> (p79AnalyzeBackfill _),
    "p78_cbo_join_reorder" -> (p78CboJoinReorder _),
    "p77_copy_into" -> (p77CopyInto _),
    "p76_ann_lake_pruned" -> (p76AnnLakePruned _),
    "p75_stats_broadcast" -> (p75StatsBroadcast _),
    "p74_metadata_delete" -> (p74MetadataDelete _),
    "p73_rewrite_deletes" -> (p73RewriteDeletes _),
    "p72_ndv_stats" -> (p72NdvStats _),
    "p71_small_file_compaction" -> (p71SmallFileCompaction _),
    "p70_expire_refs" -> (p70ExpireRefs _),
    "p69_runtime_filtering" -> (p69RuntimeFiltering _),
    "p68_agg_pushdown" -> (p68AggPushdown _),
    "p67_describe_detail" -> (p67DescribeDetail _),
    "p66_compat_bucket_join" -> (p66CompatBucketJoin _),
    "p65_write_distribution" -> (p65WriteDistribution _),
    "p64_temporal_spj" -> (p64TemporalSpj _),
    "p63_bucket_spj" -> (p63BucketSpj _),
    "p62_equality_deletes" -> (p62EqualityDeletes _),
    "p61_row_lineage" -> (p61RowLineage _),
    "p60_merge_schema_evolution" -> (p60MergeSchemaEvolution _),
    "p59_branch_wap" -> (p59BranchWap _),
    "p58_optimistic_concurrency" -> (p58OptimisticConcurrency _),
    "p57_hidden_partitioning" -> (p57HiddenPartitioning _),
    "p56_type_widening" -> (p56TypeWidening _),
    "p55_replace_table" -> (p55ReplaceTable _),
    "p54_storage_partitioned_join" -> (p54StoragePartitionedJoin _),
    "p53_log_checkpoint" -> (p53LogCheckpoint _),
    "p52_drop_column" -> (p52DropColumn _),
    "p51_rename_column" -> (p51RenameColumn _),
    "p50_sql_procedures" -> (p50SqlProcedures _),
    "p49_partition_overwrite" -> (p49PartitionOverwrite _),
    "p48_bloom_index" -> (p48BloomIndex _),
    "p47_partition_evolution" -> (p47PartitionEvolution _),
    "p46_zorder_optimize" -> (p46ZorderOptimize _),
    "p45_default_columns" -> (p45DefaultColumns _),
    "p44_merge_on_read" -> (p44MergeOnRead _),
    "p43_shallow_clone" -> (p43ShallowClone _),
    "p42_check_constraints" -> (p42CheckConstraints _),
    "p41_metadata_tables" -> (p41MetadataTables _),
    "p40_restore_version" -> (p40RestoreVersion _),
    "p39_vacuum_retention" -> (p39VacuumRetention _),
    "p38_optimize_layout" -> (p38OptimizeLayout _),
    "p37_schema_evolution" -> (p37SchemaEvolution _),
    "p36_incremental_changes" -> (p36IncrementalChanges _),
    "p35_zone_skip" -> (p35ZoneSkip _),
    "p34_partitioned_merge" -> (p34PartitionedMerge _),
    "p33_time_travel" -> (p33TimeTravel _),
    "p32_sql_delete" -> (p32SqlDelete _),
    "p31_sql_update" -> (p31SqlUpdate _),
    "p30_salt_gate" -> (p30SaltGate _),
    "p29_merge_into" -> (p29MergeInto _),
    "p28_compaction_plan" -> (p28CompactionPlan _),
    "p27_skew_audit" -> (p27SkewAudit _),
    "p26_temperature_mixture" -> (p26TemperatureMixture _),
    "p24_robust_outlier_gate" -> (p24RobustOutlierGate _),
    "p23_shard_manifest" -> (p23ShardManifest _),
    "p22_deletion_propagation" -> (p22DeletionPropagation _),
    "p21_padding_audit" -> (p21PaddingAudit _),
    "p20_scd2_dimension" -> (p20Scd2Dimension _),
    "p19_multimodal_curation" -> (p19MultimodalCuration _),
    "p18_incremental_rollup" -> (p18IncrementalRollup _),
    "p17_bucketed_join" -> (p17BucketedJoin _),
    "p16_merge_upsert" -> (p16MergeUpsert _),
    "p15_dataset_card" -> (p15DatasetCard _),
    "p14_training_order" -> (p14TrainingOrder _),
    "p13_curated_corpus" -> (p13CuratedCorpus _),
    "p12_leakage_split" -> (p12LeakageSplit _),
    "p11_upsample_epochs" -> (p11UpsampleEpochs _),
    "p10_token_budget" -> (p10TokenBudget _),
    "p09_snapshot_diff" -> (p09SnapshotDiff _),
    "p08_chunk_pack" -> (p08ChunkPack _),
    "p07_chunk_overlap" -> (p07ChunkOverlap _),
    "p06_domain_cap" -> (p06DomainCap _),
    "p05_mixture_sample" -> (p05MixtureSample _),
    "p01_clean_corpus" -> (p01CleanCorpus _),
    "p02_incremental_dedup" -> (p02IncrementalDedup _),
    "p03_bloom_incremental_dedup" -> (p03BloomIncrementalDedup _),
    "p04_sequence_packing" -> (p04SequencePacking _))

  // def, not val: p19Sql embeds Sidecars.oracleDir-keyed paths, which
  // Verify pins at runtime before dumping oracle_sql.json
  def oracle: Map[String, String] = Map(
    "p84_restore_range_cdf" -> p84Sql,
    "p83_upsert_cdc_pruned" -> p83Sql,
    "p82_ann_under_deletes" -> p82Sql,
    "p81_paged_history_reads" -> p81Sql,
    "p80_cbo_reorder_under_aqe" -> p80Sql,
    "p79_analyze_backfill" -> p79Sql,
    "p78_cbo_join_reorder" -> p78Sql,
    "p77_copy_into" -> p77Sql,
    "p76_ann_lake_pruned" -> p76Sql,
    "p75_stats_broadcast" -> p75Sql,
    "p74_metadata_delete" -> p74Sql,
    "p73_rewrite_deletes" -> p73Sql,
    "p72_ndv_stats" -> p72Sql,
    "p71_small_file_compaction" -> p71Sql,
    "p70_expire_refs" -> p70Sql,
    "p69_runtime_filtering" -> p69Sql,
    "p68_agg_pushdown" -> p68Sql,
    "p67_describe_detail" -> p67Sql,
    "p66_compat_bucket_join" -> p66Sql,
    "p65_write_distribution" -> p65Sql,
    "p64_temporal_spj" -> p64Sql,
    "p63_bucket_spj" -> p63Sql,
    "p62_equality_deletes" -> p62Sql,
    "p61_row_lineage" -> p61Sql,
    "p60_merge_schema_evolution" -> p60Sql,
    "p59_branch_wap" -> p59Sql,
    "p58_optimistic_concurrency" -> p58Sql,
    "p57_hidden_partitioning" -> p57Sql,
    "p56_type_widening" -> p56Sql,
    "p55_replace_table" -> p55Sql,
    "p54_storage_partitioned_join" -> p54Sql,
    "p53_log_checkpoint" -> p53Sql,
    "p52_drop_column" -> p52Sql,
    "p51_rename_column" -> p51Sql,
    "p50_sql_procedures" -> p50Sql,
    "p49_partition_overwrite" -> p49Sql,
    "p48_bloom_index" -> p48Sql,
    "p47_partition_evolution" -> p47Sql,
    "p46_zorder_optimize" -> p46Sql,
    "p45_default_columns" -> p45Sql,
    "p44_merge_on_read" -> p44Sql,
    "p43_shallow_clone" -> p43Sql,
    "p42_check_constraints" -> p42Sql,
    "p41_metadata_tables" -> p41Sql,
    "p40_restore_version" -> p40Sql,
    "p39_vacuum_retention" -> p39Sql,
    "p38_optimize_layout" -> p38Sql,
    "p37_schema_evolution" -> p37Sql,
    "p36_incremental_changes" -> p36Sql,
    "p35_zone_skip" -> p35Sql,
    "p34_partitioned_merge" -> p34Sql,
    "p33_time_travel" -> p33Sql,
    "p32_sql_delete" -> p32Sql,
    "p31_sql_update" -> p31Sql,
    "p30_salt_gate" -> p30Sql,
    "p29_merge_into" -> p29Sql,
    "p28_compaction_plan" -> p28Sql,
    "p27_skew_audit" -> p27Sql,
    "p26_temperature_mixture" -> p26Sql,
    "p24_robust_outlier_gate" -> p24Sql,
    "p23_shard_manifest" -> p23Sql,
    "p22_deletion_propagation" -> p22Sql,
    "p21_padding_audit" -> p21Sql,
    "p20_scd2_dimension" -> p20Sql,
    "p19_multimodal_curation" -> p19Sql,
    "p18_incremental_rollup" -> p18Sql,
    "p17_bucketed_join" -> p17Sql,
    "p16_merge_upsert" -> p16Sql,
    "p15_dataset_card" -> p15Sql,
    "p14_training_order" -> p14Sql,
    "p13_curated_corpus" -> p13Sql,
    "p12_leakage_split" -> p12Sql,
    "p11_upsample_epochs" -> p11Sql,
    "p10_token_budget" -> p10Sql,
    "p09_snapshot_diff" -> p09Sql,
    "p08_chunk_pack" -> p08Sql,
    "p07_chunk_overlap" -> p07Sql,
    "p06_domain_cap" -> p06Sql,
    "p05_mixture_sample" -> p05Sql,
    "p01_clean_corpus" -> p01Sql,
    "p02_incremental_dedup" -> p02Sql,
    // p03 is the bloom-accelerated twin of p02: the exact anti-join on the
    // maybe-duplicate sliver guarantees the SAME output, so it shares the
    // exact-semantics oracle
    "p03_bloom_incremental_dedup" -> p02Sql,
    "p04_sequence_packing" -> p04Sql)
}
