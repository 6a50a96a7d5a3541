package graft.operators

import graft.Tables
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ML operators over the documents corpus — the model-based stages of a
  * training-data pipeline, beyond the reference's regression surface
  * (SURVEY.md §2.8: the reference is regression-only; classification +
  * text featurization are north-star additions).
  */
object MlQueries {

  /** Distilled quality classifier — the fastText-style pattern every
    * pretraining pipeline runs: bootstrap WEAK labels from a cheap rule,
    * train a linear classifier over hashed bag-of-words features, deploy
    * the model as the corpus filter (in production the labels come from a
    * curated-vs-crawl contrast or LLM judgments; the plumbing is
    * identical).
    *
    * Weak label here: >= 2 occurrences of the marker token "spark" in the
    * LOWERCASED text — the same token stream the (lowercasing)
    * RegexTokenizer feeds the features, so the rule really is linear in
    * the hashed counts on any corpus, not just an all-lowercase one.
    * Deterministic, so the run is reproducible and the spec can assert
    * holdout agreement. Features: RegexTokenizer -> HashingTF(2^10) ->
    * IDF -> LogisticRegression ([[scoredHoldout]] holds the recipe; see
    * its comments for the coalesce-before-fit and 8-LBFGS-step sizing).
    * The rule is linear in the hashed counts, so a correctly-wired
    * pipeline recovers it almost exactly on held-out docs — low agreement
    * means broken feature plumbing, which is what the spec guards.
    *
    * Scale: tokenize/hash are per-row map work; IDF and LR aggregate with
    * tree-reduction (no corpus-sized shuffle). 2^10 features keeps the
    * coefficient vector broadcast-sized; at 100 TB you train on a sample
    * and SCORE the full corpus with the fitted model — scoring is a pure
    * map stage.
    *
    * Output (one row), hash-audited end to end via the t17/ml03 sidecar
    * closure: the model fit is the non-SQL step, its scored holdout
    * (doc_id, label, milli-probability) lands in this query's own
    * sidecar, and BOTH engines restate the metrics from those integers —
    * the 0.5-threshold confusion matrix (tp/fp/fn/tn), one-division
    * acc_micro, and the tie-averaged Mann-Whitney AUC published as exact
    * integer numerator/denominator (auc_num = S2 - n_pos*(n_pos+1),
    * auc_den = 2*n_pos*n_neg, with S2 the doubled positive rank sum)
    * plus its one-division auc_micro. The quantized-score AUC is the
    * PUBLISHED contract; MlClassifierSpec separately gates the
    * full-precision evaluator AUC/accuracy, so the distillation bar and
    * the cross-engine audit don't share a rounding path.
    */
  def ml02QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val side = graft.Sidecars.write(scoredHoldout(s, dir), dir, "ml02_scores")
    // Rank statistics over DISTINCT milli scores (<= 1001 rows — the
    // unpartitioned window below is bounded-cardinality by construction,
    // one of GraftSession.quietAuditedWarnings' sanctioned sites): for a
    // score s with c_lt scores strictly below it and cnt tied at it,
    // every positive at s contributes rank_min + rank_max = 2*c_lt +
    // cnt + 1 to the doubled rank sum S2 — the tie-averaged Mann-Whitney
    // rank sum without any half-integers.
    val per = side.groupBy(col("p_milli"))
      .agg(count(lit(1)).as("cnt"), sum(col("label")).as("pos"))
    val w = Window.orderBy(col("p_milli"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = per
      .withColumn("c_lt", sum(col("cnt")).over(w) - col("cnt"))
    ranked
      .agg(sum(col("cnt")).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("pos") * (lit(2L) * col("c_lt") + col("cnt") + lit(1L))).as("s2"),
        sum(when(col("p_milli") >= 500L, col("cnt")).otherwise(0L)).as("n_pred_pos"),
        sum(when(col("p_milli") >= 500L, col("pos")).otherwise(0L)).as("tp"))
      .select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        col("tp"), (col("n_pred_pos") - col("tp")).as("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        (col("n") - col("n_pos") - (col("n_pred_pos") - col("tp"))).as("tn"),
        floor((col("tp") + col("n") - col("n_pos") - (col("n_pred_pos") - col("tp")))
          .cast(DoubleType) / col("n") * 1e6).cast(LongType).as("acc_micro"),
        (col("s2") - col("n_pos") * (col("n_pos") + lit(1L))).as("auc_num"),
        (lit(2L) * col("n_pos") * (col("n") - col("n_pos"))).as("auc_den"),
        floor((col("s2") - col("n_pos") * (col("n_pos") + lit(1L))).cast(DoubleType)
          / (lit(2L) * col("n_pos") * (col("n") - col("n_pos"))).cast(DoubleType)
          * 1e6).cast(LongType).as("auc_micro"))
  }

  private def ml02Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("ml02_scores")}/*.parquet'),
      |per AS (SELECT p_milli, COUNT(*) AS cnt, CAST(SUM(label) AS BIGINT) AS pos
      |        FROM side GROUP BY 1),
      |r AS (SELECT p_milli, cnt, pos,
      |    CAST(SUM(cnt) OVER (ORDER BY p_milli
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - cnt AS c_lt
      |  FROM per),
      |a AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(pos * (2 * c_lt + cnt + 1)) AS BIGINT) AS s2,
      |    CAST(SUM(CASE WHEN p_milli >= 500 THEN cnt ELSE 0 END) AS BIGINT) AS n_pred_pos,
      |    CAST(SUM(CASE WHEN p_milli >= 500 THEN pos ELSE 0 END) AS BIGINT) AS tp
      |  FROM r)
      |SELECT n, n_pos, n - n_pos AS n_neg, tp,
      |  n_pred_pos - tp AS fp, n_pos - tp AS fn,
      |  n - n_pos - (n_pred_pos - tp) AS tn,
      |  CAST(FLOOR(CAST(tp + n - n_pos - (n_pred_pos - tp) AS DOUBLE) / n * 1e6) AS BIGINT) AS acc_micro,
      |  s2 - n_pos * (n_pos + 1) AS auc_num,
      |  2 * n_pos * (n - n_pos) AS auc_den,
      |  CAST(FLOOR(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
      |    / CAST(2 * n_pos * (n - n_pos) AS DOUBLE) * 1e6) AS BIGINT) AS auc_micro
      |FROM a""".stripMargin

  /** Calibration audit of the ml02 classifier — the reliability-diagram
    * measurement a pipeline runs before TRUSTING a model score as a
    * filter threshold: an uncalibrated quality classifier silently
    * shifts the corpus mix when its 0.9 means "60% likely good". Same
    * training recipe as ml02 (the audit targets that model), then the
    * held-out (predicted probability, label) pairs land in 10 decile
    * bins: per bin, count, probability mass, and positive count — the
    * exact integer ingredients of ECE (expected calibration error),
    * published as integers so the comparison is bit-exact.
    *
    * The t17 sidecar closure applies: the model fit is not
    * SQL-expressible, so the run materializes its scored holdout
    * (doc_id, milli-probability, label) as a parquet sidecar and the
    * DuckDB oracle recomputes the ENTIRE binning/rollup stage from it —
    * the ML tier's first oracle-green row (ml01/ml02 stay rows-only by
    * SURVEY §5.2; their outputs are model METRICS, not row sets).
    *
    * Scale: scoring is a map stage over the holdout; the rollup is a
    * 10-key aggregation. Probabilities quantize to milli units
    * (floor(p*1000 + 0.5)) — the repo's standard float-rounding
    * contract — so every downstream number is int64.
    */
  /** The ml02-shaped model's scored holdout (doc_id, label, p_milli) —
    * the shared chain behind ml03 (calibration) and ml04 (PR sweep);
    * each caller materializes it under its OWN sidecar name so neither
    * query depends on the other having run. */
  private def scoredHoldout(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("text"),
        (size(expr("regexp_extract_all(lower(text), '\\\\bspark\\\\b', 0)")) >= 2)
          .cast(DoubleType).as("label"))
    val Array(train, test) = docs.randomSplit(Array(0.8, 0.2), seed = 42)
    train.cache(); test.cache()
    try {
      val tok = new RegexTokenizer()
        .setInputCol("text").setOutputCol("words").setPattern("[^a-z0-9]+")
      val tf = new HashingTF()
        .setInputCol("words").setOutputCol("tf").setNumFeatures(1 << 10)
      val idf = new IDF().setInputCol("tf").setOutputCol("features")
      val lr = new LogisticRegression()
        .setMaxIter(8).setTol(1e-4).setRegParam(1e-4)
      val featPipe = new Pipeline().setStages(Array(tok, tf, idf)).fit(train)
      val lrModel = lr.fit(
        featPipe.transform(train).select(col("label"), col("features")).coalesce(4))
      lrModel.transform(
          featPipe.transform(test)
            .select(col("doc_id"), col("label"), col("features")).coalesce(4))
        .withColumn("parr", vector_to_array(col("probability")))
        .select(col("doc_id"),
          col("label").cast(LongType).as("label"),
          expr("cast(floor(element_at(parr, 2) * 1000D + 0.5D) as bigint)").as("p_milli"))
        // eager checkpoint: the scoring plan must run while train/test
        // are still cached (the finally below unpersists them)
        .localCheckpoint()
    } finally { train.unpersist(); test.unpersist() }
  }

  def ml03CalibrationAudit(s: SparkSession, dir: String): DataFrame = {
    val side = graft.Sidecars.write(scoredHoldout(s, dir), dir, "ml03_calib")
    side
      .withColumn("bin", expr("least(p_milli div 100, 9L)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("p_milli")).as("sum_p_milli"),
        sum(col("label")).as("n_pos"))
      .orderBy(col("bin"))
  }

  // ---------------------------------------------------------------- ml04
  /** Precision/recall THRESHOLD SWEEP over the scored holdout — the
    * measurement that turns ml02's classifier into a quality FILTER: a
    * curation pipeline doesn't consume probabilities, it consumes a
    * cutoff, and the cutoff is chosen off exactly this table (precision
    * at the filter's acceptance rate). Nine candidate cutoffs (100..900
    * milli), each with exact integer confusion counts and one-division
    * precision/recall (p26's rule). The model fit is the non-SQL step;
    * scoring lands in this query's own sidecar (the t17/ml03 closure)
    * and the sweep is restated in SQL over it — every threshold's
    * counts hash-audited.
    *
    * Scale: the sweep is one 9-way explode over the holdout frame plus
    * one aggregation — O(9n), no per-threshold rescans.
    */
  def ml04PrSweep(s: SparkSession, dir: String): DataFrame = {
    val side = graft.Sidecars.write(scoredHoldout(s, dir), dir, "ml04_scores")
    val tot = side.agg(sum(col("label")).as("n_pos_total"))
    side
      .select(col("label"), col("p_milli"),
        explode(expr("sequence(100L, 900L, 100L)")).as("thr"))
      .groupBy(col("thr"))
      .agg(sum(when(col("p_milli") >= col("thr"), 1L).otherwise(0L)).as("n_pred_pos"),
        sum(when(col("p_milli") >= col("thr"), col("label")).otherwise(0L)).as("tp"))
      .crossJoin(broadcast(tot))
      .withColumn("fp", col("n_pred_pos") - col("tp"))
      .withColumn("fn", col("n_pos_total") - col("tp"))
      .withColumn("precision_milli", floor(
        col("tp").cast(DoubleType) / nullif(col("n_pred_pos"), lit(0L)) * 1e3).cast(LongType))
      .withColumn("recall_milli", floor(
        col("tp").cast(DoubleType) / nullif(col("n_pos_total"), lit(0L)) * 1e3).cast(LongType))
      .select(col("thr"), col("n_pred_pos"), col("tp"), col("fp"), col("fn"),
        col("precision_milli"), col("recall_milli"))
      .orderBy(col("thr"))
  }

  private def ml04Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("ml04_scores")}/*.parquet'),
      |tot AS (SELECT CAST(SUM(label) AS BIGINT) AS n_pos_total FROM side),
      |sweep AS (
      |  SELECT g.thr,
      |    CAST(SUM(CASE WHEN p_milli >= g.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
      |    CAST(SUM(CASE WHEN p_milli >= g.thr THEN label ELSE 0 END) AS BIGINT) AS tp
      |  FROM side CROSS JOIN (SELECT CAST(unnest(generate_series(100, 900, 100)) AS BIGINT) AS thr) g
      |  GROUP BY g.thr)
      |SELECT thr, n_pred_pos, tp,
      |  n_pred_pos - tp AS fp,
      |  n_pos_total - tp AS fn,
      |  CAST(FLOOR(CAST(tp AS DOUBLE) / NULLIF(n_pred_pos, 0) * 1e3) AS BIGINT) AS precision_milli,
      |  CAST(FLOOR(CAST(tp AS DOUBLE) / NULLIF(n_pos_total, 0) * 1e3) AS BIGINT) AS recall_milli
      |FROM sweep CROSS JOIN tot
      |ORDER BY thr""".stripMargin

  private def ml03Sql: String =
    s"""WITH side AS (SELECT * FROM '${graft.Sidecars.oraclePath("ml03_calib")}/*.parquet')
      |SELECT LEAST(p_milli // 100, 9) AS bin, COUNT(*) AS n,
      |  CAST(SUM(p_milli) AS BIGINT) AS sum_p_milli,
      |  CAST(SUM(label) AS BIGINT) AS n_pos
      |FROM side GROUP BY 1 ORDER BY bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml04_pr_sweep" -> (ml04PrSweep _),
    "ml03_calibration_audit" -> (ml03CalibrationAudit _),
    "ml02_quality_classifier" -> (ml02QualityClassifier _))

  /** Every ml row is oracle-checked: the iterative model fits are the
    * non-SQL steps, and each query's scored-holdout sidecar makes its
    * downstream metric arithmetic plain SQL (MlClassifierSpec still holds
    * the full-precision metric thresholds). def, not val: the SQL embeds
    * the Sidecars.oracleDir-keyed path Verify pins at runtime. */
  def oracle: Map[String, String] = Map(
    "ml04_pr_sweep" -> ml04Sql,
    "ml03_calibration_audit" -> ml03Sql,
    "ml02_quality_classifier" -> ml02Sql)
}
