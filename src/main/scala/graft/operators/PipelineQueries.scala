package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val scored = Tables.documents(s, dir)
      .withColumn("n_tokens",
        expr("size(regexp_extract_all(text, '[A-Za-z0-9]+', 0))").cast(DoubleType))
      .withColumn("len_score", least(lit(1.0), length(col("text")).cast(DoubleType) / lit(500.0)))
      .filter(col("n_tokens") >= 10 && col("len_score") >= 0.2)
      .withColumn("canon",
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
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
      |SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
      |  SUM(CAST(n_tokens AS BIGINT)) AS total_tokens
      |FROM keepers JOIN filtered USING (fp, doc_id)
      |GROUP BY source ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_clean_corpus" -> (p01CleanCorpus _))

  val oracle: Map[String, String] = Map(
    "p01_clean_corpus" -> p01Sql)
}
