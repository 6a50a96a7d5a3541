package graft.operators

import graft.Tables
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
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
    * Weak label here: >= 2 occurrences of the marker token "spark" —
    * deterministic, so the run is reproducible and the spec can assert
    * holdout agreement. Features: RegexTokenizer -> HashingTF(2^15) ->
    * IDF -> LogisticRegression. The rule is linear in the hashed counts,
    * so a correctly-wired pipeline recovers it almost exactly on held-out
    * docs — low agreement means broken feature plumbing, which is what
    * the spec guards.
    *
    * Scale: tokenize/hash are per-row map work; IDF and LR aggregate with
    * tree-reduction (no corpus-sized shuffle). 2^15 features keeps the
    * coefficient vector broadcast-sized; at 100 TB you train on a sample
    * and SCORE the full corpus with the fitted model — scoring is a pure
    * map stage.
    *
    * Output: one row of run metrics (rows-only; model metrics are not
    * SQL-expressible — see MlClassifierSpec for the threshold gate).
    */
  def ml02QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("text"),
        (size(expr("regexp_extract_all(text, '\\\\bspark\\\\b', 0)")) >= 2)
          .cast(DoubleType).as("label"))
    val Array(train, test) = docs.randomSplit(Array(0.8, 0.2), seed = 42)
    train.cache(); test.cache()
    try {
      val tok = new RegexTokenizer()
        .setInputCol("text").setOutputCol("words")
        .setPattern("[^a-z0-9]+") // split on non-alnum: Tables.canonText's tokenization
      // 2^12 buckets: collision-free headroom for the synthetic ~40-token
      // vocabulary (a production corpus would use 2^18-2^20 — the LBFGS
      // cost scales with the bucket count, so size it to the vocabulary)
      val tf = new HashingTF()
        .setInputCol("words").setOutputCol("tf").setNumFeatures(1 << 12)
      val idf = new IDF().setInputCol("tf").setOutputCol("features")
      // 10 LBFGS steps at loose tol: each step is a full treeAggregate
      // job, and the linear rule separates in a handful of steps — the
      // spec's 0.9-agreement gate is the arbiter of "enough"
      val lr = new LogisticRegression()
        .setMaxIter(10).setTol(1e-4).setRegParam(1e-4)
      val model = new Pipeline().setStages(Array(tok, tf, idf, lr)).fit(train)
      val pred = model.transform(test).cache()
      try {
        val acc = new MulticlassClassificationEvaluator()
          .setMetricName("accuracy").evaluate(pred)
        val auc = new BinaryClassificationEvaluator()
          .setMetricName("areaUnderROC").evaluate(pred)
        val posRate = pred.agg(avg(col("label"))).head.getDouble(0)
        val schema = StructType(Seq(
          StructField("n_train", LongType, nullable = false),
          StructField("n_test", LongType, nullable = false),
          StructField("test_pos_rate", DoubleType, nullable = false),
          StructField("accuracy", DoubleType, nullable = false),
          StructField("auc", DoubleType, nullable = false)))
        val row = org.apache.spark.sql.Row(
          train.count(), test.count(),
          math.floor(posRate * 10000.0 + 0.5) / 10000.0,
          math.floor(acc * 10000.0 + 0.5) / 10000.0,
          math.floor(auc * 10000.0 + 0.5) / 10000.0)
        s.createDataFrame(s.sparkContext.parallelize(Seq(row)), schema)
      } finally pred.unpersist()
    } finally { train.unpersist(); test.unpersist() }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml02_quality_classifier" -> (ml02QualityClassifier _))

  /** Not SQL-expressible (iterative model fit) — rows-only for the driver;
    * MlClassifierSpec holds the metric thresholds. */
  val oracle: Map[String, String] = Map.empty
}
