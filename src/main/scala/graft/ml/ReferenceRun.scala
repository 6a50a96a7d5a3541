package graft.ml

import graft.GraftSession
import graft.etl.SteelSchema
import org.apache.spark.ml.Pipeline

/** The reference notebook's full ML workload, end-to-end (py:155-482):
  * seed-64 75/25 split, 8 baseline family fits with 5-metric evaluation,
  * the 8 TrainValidationSplit grid searches, 3-fold cross-validation of
  * the winning DecisionTree grid, and persistence of the winner.
  *
  * Run out-of-band (it is the wall-clock bulk — 75 TVS fits + 27 CV fits):
  *   sbt 'runMain graft.ml.ReferenceRun [baseline|tune|cv|all] [outDir]'
  */
object ReferenceRun {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("baseline")
    val validModes = Set("baseline", "tune", "cv", "all")
    require(validModes.contains(mode),
      s"unknown mode '$mode' — expected one of ${validModes.mkString(", ")}")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft_ml")
    val spark = GraftSession("graft-reference-run")
    val data = SteelSchema.renamed(SteelSchema.load(spark))
    val Array(train, test) = data.randomSplit(Array(0.75, 0.25), seed = 64)
    train.cache(); test.cache()
    println(s"train=${train.count()} test=${test.count()}")

    if (mode == "baseline" || mode == "all") {
      val results = Regressors.baselines().map { case (name, model) =>
        val fitted = FeaturePipeline.pipeline(model).fit(train)
        val m = Evaluate.metrics(fitted.transform(test))
        println(f"$name%-40s R2=${m.r2}%.6f RMSE=${m.rmse}%.6f MAE=${m.mae}%.6f MSE=${m.mse}%.6f Var=${m.explainedVariance}%.3f")
        name -> m
      }
      Evaluate.comparisonDf(spark, results).show(20, truncate = false)
    }

    if (mode == "tune" || mode == "all") {
      val results = Regressors.grids().map { case (name, model, grid) =>
        val fitted = Tune.fitTvs(model, grid, train)
        val m = Evaluate.metrics(fitted.transform(test))
        println(f"tuned:$name%-40s R2=${m.r2}%.6f RMSE=${m.rmse}%.6f MAE=${m.mae}%.6f")
        name -> m
      }
      Evaluate.comparisonDf(spark, results).show(20, truncate = false)
    }

    if (mode == "cv" || mode == "all") {
      val dt = Regressors.decisionTree()
      val pipeline: Pipeline = FeaturePipeline.pipeline(dt)
      val cvModel = Tune.fitCv(pipeline, Regressors.dtParamGrid(dt), train)
      val m = Evaluate.metrics(cvModel.transform(test))
      println(f"cv:DecisionTree R2=${m.r2}%.6f (reference: 0.9953278843713657)")
      // the reference persisted the *unfitted* winner pipeline (py:482)
      Tune.savePipeline(pipeline, s"$outDir/steel_energy_prediction_pipeline")
    }

    spark.stop()
  }
}
