package graft.ml

import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.regression._
import org.apache.spark.ml.tuning.ParamGridBuilder
import org.apache.spark.ml.PipelineStage

/** The reference's 8 regressor families with their exact hyper-parameter
  * grids (SURVEY.md §2.8 M5-M12, M14; py:237-265 baselines, py:340-417
  * grids). All models predict Usage_kWh from scaledFeatures.
  */
object Regressors {

  private val label = FeaturePipeline.LabelCol
  private val feats = FeaturePipeline.ScaledFeaturesCol

  def linearRegression(): LinearRegression =
    new LinearRegression().setLabelCol(label).setFeaturesCol(feats)

  def decisionTree(): DecisionTreeRegressor =
    new DecisionTreeRegressor().setLabelCol(label).setFeaturesCol(feats)

  def randomForest(): RandomForestRegressor =
    new RandomForestRegressor().setLabelCol(label).setFeaturesCol(feats)

  def gbt(): GBTRegressor =
    new GBTRegressor().setLabelCol(label).setFeaturesCol(feats).setPredictionCol("prediction")

  def fm(): FMRegressor =
    new FMRegressor().setLabelCol(label).setFeaturesCol(feats)

  def glrPoisson(): GeneralizedLinearRegression =
    new GeneralizedLinearRegression().setFamily("poisson").setLabelCol(label).setFeaturesCol(feats)

  def glrTweedie(): GeneralizedLinearRegression =
    new GeneralizedLinearRegression().setFamily("tweedie").setLabelCol(label).setFeaturesCol(feats)

  def isotonic(): IsotonicRegression =
    new IsotonicRegression().setLabelCol(label).setFeaturesCol(feats)

  /** Baseline families in the reference's run order (py:237-265). */
  def baselines(): Seq[(String, PipelineStage)] = Seq(
    "LinearRegression" -> linearRegression(),
    "DecisionTreeRegressor" -> decisionTree(),
    "RandomForestRegressor" -> randomForest(),
    "GBTRegressor" -> gbt(),
    "FMRegressor" -> fm(),
    "GeneralizedLinearRegression_poisson" -> glrPoisson(),
    "GeneralizedLinearRegression_tweedie" -> glrTweedie(),
    "IsotonicRegression" -> isotonic())

  /** The 8 tuning grids, reference-exact (py:340-417). */
  def grids(): Seq[(String, PipelineStage, Array[ParamMap])] = {
    val lr = linearRegression()
    val lrGrid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 0.1, 0.5))
      .addGrid(lr.fitIntercept, Array(true, false))
      .addGrid(lr.elasticNetParam, Array(0.0, 0.5, 1.0))
      .build()
    val dt = decisionTree()
    val dtGrid = dtParamGrid(dt)
    val rf = randomForest()
    val rfGrid = new ParamGridBuilder()
      .addGrid(rf.numTrees, Array(10, 20, 50))
      .addGrid(rf.featureSubsetStrategy, Array("all", "auto", "onethird", "sqrt", "log2"))
      .build()
    val f = fm()
    val fmGrid = new ParamGridBuilder()
      .addGrid(f.stepSize, Array(0.001, 0.01, 0.1))
      .addGrid(f.factorSize, Array(4, 8, 16))
      .build()
    val iso = isotonic()
    val isoGrid = new ParamGridBuilder()
      .addGrid(iso.isotonic, Array(true, false))
      .build()
    val poi = glrPoisson()
    val poiGrid = new ParamGridBuilder()
      .addGrid(poi.regParam, Array(0.01, 0.1, 0.5))
      .addGrid(poi.fitIntercept, Array(true, false))
      .build()
    val tw = glrTweedie()
    val twGrid = new ParamGridBuilder()
      .addGrid(tw.regParam, Array(0.01, 0.1, 0.5))
      .addGrid(tw.fitIntercept, Array(true, false))
      .addGrid(tw.variancePower, Array(0.0, 1.0))
      .build()
    val g = gbt()
    val gbtGrid = new ParamGridBuilder()
      .addGrid(g.maxDepth, Array(5, 10))
      .addGrid(g.maxIter, Array(10, 20))
      .build()
    Seq(
      ("LinearRegression", lr, lrGrid),
      ("DecisionTreeRegressor", dt, dtGrid),
      ("RandomForestRegressor", rf, rfGrid),
      ("FMRegressor", f, fmGrid),
      ("IsotonicRegression", iso, isoGrid),
      ("GeneralizedLinearRegression_poisson", poi, poiGrid),
      ("GeneralizedLinearRegression_tweedie", tw, twGrid),
      ("GBTRegressor", g, gbtGrid))
  }

  /** The winner's grid (py:351-355), reused by CrossValidator (py:466-471). */
  def dtParamGrid(dt: DecisionTreeRegressor): Array[ParamMap] =
    new ParamGridBuilder()
      .addGrid(dt.maxDepth, Array(2, 5, 10))
      .addGrid(dt.maxBins, Array(32, 64, 128))
      .build()
}
