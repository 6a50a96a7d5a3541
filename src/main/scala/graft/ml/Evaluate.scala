package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's 5-metric evaluation bundle (SURVEY.md §2.8 M13;
  * py:213-222) and the model-comparison frame (S3 + O1; py:274-294).
  *
  * Each metric is one aggregate job over (prediction, label); the whole
  * bundle is computed with five RegressionEvaluator passes to mirror the
  * reference exactly (a single agg could produce all five — noted as the
  * scale optimization, but evaluation cost is negligible next to fit).
  */
object Evaluate {

  case class Metrics(r2: Double, rmse: Double, mae: Double, mse: Double, explainedVariance: Double)

  private def evaluator(metric: String): RegressionEvaluator =
    new RegressionEvaluator()
      .setLabelCol(FeaturePipeline.LabelCol)
      .setPredictionCol("prediction")
      .setMetricName(metric)

  def metrics(predictions: DataFrame): Metrics = {
    // cache first: each evaluator pass otherwise re-runs the full feature
    // pipeline transform upstream of `predictions` (5x the transform cost
    // measured on ml01). Callers pass freshly-built frames, so the
    // cache/unpersist pair is wholly owned here.
    val p = predictions.cache()
    try Metrics(
      r2 = evaluator("r2").evaluate(p),
      rmse = evaluator("rmse").evaluate(p),
      mae = evaluator("mae").evaluate(p),
      mse = evaluator("mse").evaluate(p),
      explainedVariance = evaluator("var").evaluate(p))
    finally p.unpersist()
  }

  /** The comparison DataFrame schema, including the deliberate space in
    * "Explained Variance" (py:274-281). */
  val comparisonSchema: StructType = StructType(Seq(
    StructField("Model", StringType, nullable = true),
    StructField("R2", DoubleType, nullable = true),
    StructField("MAE", DoubleType, nullable = true),
    StructField("MSE", DoubleType, nullable = true),
    StructField("RMSE", DoubleType, nullable = true),
    StructField("Explained Variance", DoubleType, nullable = true)))

  /** Build the comparison frame from driver-side rows + explicit schema and
    * order by R2 desc (py:283-294) — the reference's in-memory-source +
    * sort pattern (LocalTableScan -> Sort).
    */
  def comparisonDf(spark: SparkSession, rows: Seq[(String, Metrics)]): DataFrame = {
    val data = rows.map { case (name, m) =>
      Row(name, m.r2, m.mae, m.mse, m.rmse, m.explainedVariance)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(data.toList, 1), comparisonSchema)
      .orderBy(org.apache.spark.sql.functions.col("R2").desc)
  }
}
