package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineStage}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, TrainValidationSplit, TrainValidationSplitModel}
import org.apache.spark.sql.DataFrame

/** Hyper-parameter search (SURVEY.md §2.8 M15/M16; py:308-330,
  * py:464-473) and pipeline persistence (S2; py:482).
  *
  * The reference leaves `parallelism` unset (sequential fits). We default
  * to parallelism=4: candidate fits are independent Spark jobs, so running
  * several concurrently overlaps their stages — the correct setting on a
  * big cluster too (bounded by memory for model states, not cores).
  */
object Tune {

  private def r2Evaluator: RegressionEvaluator =
    new RegressionEvaluator().setMetricName("r2").setLabelCol(FeaturePipeline.LabelCol)

  /** TrainValidationSplit over the feature pipeline + model, trainRatio=0.8,
    * R2 selection (py:318-319). */
  def tvs(model: PipelineStage, grid: Array[ParamMap], parallelism: Int = 4): TrainValidationSplit =
    new TrainValidationSplit()
      .setEstimator(FeaturePipeline.pipeline(model))
      .setEvaluator(r2Evaluator)
      .setEstimatorParamMaps(grid)
      .setTrainRatio(0.8)
      .setParallelism(parallelism)
      .setSeed(64L)

  def fitTvs(model: PipelineStage, grid: Array[ParamMap], train: DataFrame): TrainValidationSplitModel =
    tvs(model, grid).fit(train)

  /** 3-fold CrossValidator over the winning pipeline (py:466-471). */
  def cv(pipeline: Pipeline, grid: Array[ParamMap], numFolds: Int = 3, parallelism: Int = 4): CrossValidator =
    new CrossValidator()
      .setEstimator(pipeline)
      .setEvaluator(r2Evaluator)
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setParallelism(parallelism)
      .setSeed(64L)

  def fitCv(pipeline: Pipeline, grid: Array[ParamMap], train: DataFrame): CrossValidatorModel =
    cv(pipeline, grid).fit(train)

  /** Persist / reload an (unfitted) Pipeline — matching the reference's
    * on-disk artifact, which saved the estimator, not the fitted model
    * (SURVEY.md §2.8 quirks; pipe:metadata has class ml.Pipeline). For
    * deployment our API also persists fitted PipelineModels via the same
    * MLWritable path.
    */
  def savePipeline(pipeline: Pipeline, path: String): Unit =
    pipeline.write.overwrite().save(path)

  def loadPipeline(path: String): Pipeline = Pipeline.load(path)
}
